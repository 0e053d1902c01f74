package graft

import graft.observability.Log

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LogSpec extends AnyFunSuite with Matchers {

  test("text format renders key=value pairs") {
    Log.format = Log.Text
    Log.render("INFO", "loaded", Seq("rows" -> 42, "mode" -> "append")) shouldBe
      "loaded rows=42 mode=append"
  }

  test("json format renders an escaped structured line") {
    Log.format = Log.Json
    try {
      Log.render("INFO", "metric:flush", Seq("rows" -> 10)) shouldBe
        """{"level":"INFO","message":"metric:flush","rows":"10"}"""
      Log.render("WARNING", "bad \"quote\"\n", Nil) shouldBe
        """{"level":"WARNING","message":"bad \"quote\"\n"}"""
    } finally Log.format = Log.Text
  }

  test("suppressAndWarn returns Some on success, None on failure, never throws") {
    Log.suppressAndWarn("op")(21 * 2) shouldBe Some(42)
    Log.suppressAndWarn("op")(sys.error("boom")) shouldBe None
  }
}
