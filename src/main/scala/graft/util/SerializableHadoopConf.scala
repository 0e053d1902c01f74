package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Hadoop `Configuration` is not `java.io.Serializable`; this wrapper
  * ships one inside a Spark closure/broadcast by writing the key-value
  * pairs through Hadoop's own `Writable` protocol (the same pattern
  * Spark uses internally for its file-source jobs). Lets executor-side
  * work — e.g. the commit path's footer-stats job — see the SESSION's
  * `spark.hadoop.*` settings instead of a bare `new Configuration()`.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
