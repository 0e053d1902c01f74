package graft.queries

import QueryHelpers._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}

import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators wired into the harness: text
  * analysis, dedup (exact + near-dup families), similarity search, and
  * multimodal plumbing — each over the driver's `documents` /
  * `embeddings` tables with a DuckDB oracle wherever the math is
  * SQL-expressible (hash-based ops are internal-consistency /
  * rows-only).
  */
object PipelineQueries {

  /** DuckDB dual of [[TextFunctions.wordTokens]]. */
  private val DTOKENS =
    """list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0)"""

  /** 10 deterministic near-duplicates of `baseId`'s embedding, with
    * PORTABLE md5-derived per-element scaling (1 + (md5(i_d) % 5)/1000,
    * cosine ~0.9999): both engines compute identical doubles, cast to
    * identical float32s — so a DuckDB oracle can rebuild the exact
    * augmented corpus. Shared by the graduated q32/q32b ANN rows.
    */
  private def plantedNearDups(s: org.apache.spark.sql.SparkSession,
                              e: org.apache.spark.sql.DataFrame,
                              baseId: Long, prefix: Long): org.apache.spark.sql.DataFrame =
    e.where(col("vec_id") === baseId)
      .select(col("embedding").as("qv"))
      .crossJoin(s.range(1, 11).toDF("i"))
      .select((lit(prefix) + col("i")).as("vec_id"),
        zip_with(col("qv"), sequence(lit(0), size(col("qv")) - 1),
          (x, d) => (x.cast("double") * (lit(1.0) +
            (conv(substring(md5(concat(col("i").cast("string"), lit("_"),
              d.cast("string"))), 1, 15), 16, 10).cast("long") % 5)
              .cast("double") / 1000.0)).cast("float")).as("embedding"))

  /** DuckDB dual: exact cosine top-10 over corpus-minus-base plus the
    * planted near-duplicates of `baseId` (same md5 scaling ladder).
    */
  private def plantedTopKSql(baseId: Int, prefix: Int): String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $baseId),
       |planted AS (
       |  SELECT $prefix + i AS vec_id,
       |    list_transform(range(0, len(qv)),
       |      d -> CAST(qv[d+1] * (1.0 +
       |        (CAST(('0x' || substring(md5(i || '_' || d), 1, 15)) AS UBIGINT) % 5) / 1000.0)
       |        AS FLOAT)) AS embedding
       |  FROM q, range(1, 11) t(i)),
       |corpus AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id <> $baseId
       |  UNION ALL SELECT vec_id, embedding FROM planted)
       |SELECT c.vec_id,
       |  ROUND(list_cosine_similarity(
       |    list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
       |    (SELECT list_transform(qv, x -> CAST(x AS DOUBLE)) FROM q)), 4) AS cos
       |FROM corpus c ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin

  val queries: Map[String, Q] = Map(

    // event sessionization: 30-minute inactivity gap starts a new
    // session (lag + cumulative sum — the standard distributed
    // sessionization shape; one shuffle on user_id)
    "q56_sessionize" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = events(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        val gapped = e.select(col("user_id"), col("ts"))
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("new_session")).over(w))
        gapped.groupBy(col("user_id"))
          .agg(countDistinct(col("session_id")).as("sessions"),
            count(lit(1)).as("events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts,
             |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM g),
             |c AS (
             |  SELECT user_id,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
             |  FROM s)
             |SELECT user_id, COUNT(DISTINCT session_id) AS sessions, COUNT(*) AS events
             |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // as-of join: each view event picks the user's latest prior-or-
    // simultaneous click (DuckDB's native ASOF JOIN is the oracle)
    "q59_asof_join" -> Q(
      (s, dir) => {
        import graft.operators.AsOfJoin
        val e = events(s, dir)
        val views = e.where(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = e.where(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
        AsOfJoin.join(views, clicks, Seq("user_id"),
            leftTs = "ts", rightTs = "click_ts", rightCols = Seq("click_id"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("views"),
            count(col("click_id")).as("views_with_prior_click"),
            countDistinct(col("click_id")).as("distinct_clicks_matched"))
          .orderBy(col("user_id"))
      },
      Some("""WITH views AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
             |clicks AS (
             |  SELECT user_id, ts AS click_ts, event_id AS click_id
             |  FROM events WHERE event_type = 'click'),
             |joined AS (
             |  SELECT v.user_id, v.event_id, c.click_id
             |  FROM views v ASOF LEFT JOIN clicks c
             |    ON v.user_id = c.user_id AND v.ts >= c.click_ts)
             |SELECT user_id, COUNT(*) AS views,
             |  COUNT(click_id) AS views_with_prior_click,
             |  COUNT(DISTINCT click_id) AS distinct_clicks_matched
             |FROM joined GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // range join: click/view events as 5-minute activity intervals —
    // overlapping pairs per user via the binned equi-join (oracle uses
    // DuckDB's inequality join over the same arithmetic)
    "q60_range_join" -> Q(
      (s, dir) => {
        import graft.operators.RangeJoin
        val e = events(s, dir).withColumn("t", unix_micros(col("ts")))
        val win = 300000000L // 5 min in micros
        val clicks = e.where(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("t").as("cs"), (col("t") + win).as("ce"))
        val views = e.where(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("t").as("vs"), (col("t") + win).as("ve"))
        RangeJoin.intervals(clicks, views, Seq("user_id"),
            "cs", "ce", "vs", "ve", binSize = win)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("overlaps"),
            countDistinct(col("click_id")).as("clicks_active"),
            countDistinct(col("view_id")).as("views_active"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS cs,
             |    epoch_us(ts) + 300000000 AS ce
             |  FROM events WHERE event_type = 'click'),
             |v AS (
             |  SELECT user_id, event_id AS view_id, epoch_us(ts) AS vs,
             |    epoch_us(ts) + 300000000 AS ve
             |  FROM events WHERE event_type = 'view')
             |SELECT c.user_id, COUNT(*) AS overlaps,
             |  COUNT(DISTINCT click_id) AS clicks_active,
             |  COUNT(DISTINCT view_id) AS views_active
             |FROM c JOIN v ON c.user_id = v.user_id AND cs <= ve AND vs <= ce
             |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin)),

    // JSON property extraction from the events props column
    "q57_json_props" -> Q(
      (s, dir) => events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
             |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
             |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- text analysis ------------------------------------------------

    "q20_token_stats" -> Q(
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("tokens"),
          sum(size(TextFunctions.wordTokens(col("text"))).cast("long")).as("words"))
        .orderBy(col("lang")),
      Some(s"""SELECT lang, COUNT(*) AS docs,
              |  CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0))) AS BIGINT) AS tokens,
              |  CAST(SUM(len($DTOKENS)) AS BIGINT) AS words
              |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    "q21_word_freq" -> Q(
      (s, dir) => t(s, dir, "documents")
        .select(explode(TextFunctions.wordTokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("word"))
        .limit(100),
      Some(s"""SELECT word, COUNT(*) AS freq
              |FROM (SELECT unnest($DTOKENS) AS word FROM documents)
              |GROUP BY word ORDER BY freq DESC, word LIMIT 100""".stripMargin)),

    "q22_quality_scores" -> Q(
      (s, dir) => t(s, dir, "documents")
        .where(col("doc_id") < 200)
        .select(
          col("doc_id"),
          round(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"),
          round(TextFunctions.stopwordRatio(col("text")), 4).as("stopword_ratio"),
          round(TextFunctions.meanWordLength(col("text")), 4).as("mean_word_len"),
          TextFunctions.tokenCount(col("text")).as("tokens"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  ROUND(CASE WHEN len(text) = 0 THEN 0.0
              |    ELSE (len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / len(text) END, 4) AS punct_ratio,
              |  ROUND(CASE WHEN len($DTOKENS) = 0 THEN 0.0
              |    ELSE len(list_filter($DTOKENS, x -> x IN (${TextFunctions.EnglishStopwords.map(w => s"'$w'").mkString(",")}))) * 1.0
              |      / len($DTOKENS) END, 4) AS stopword_ratio,
              |  ROUND(CASE WHEN len($DTOKENS) = 0 THEN 0.0
              |    ELSE list_sum(list_transform($DTOKENS, x -> len(x))) * 1.0 / len($DTOKENS) END, 4) AS mean_word_len,
              |  len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS tokens
              |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // language-ID heuristic vs labeled lang column; ties break to the
    // alphabetically-largest language in BOTH engines. Uses the codegen'd
    // explode+broadcast-marker-join+argmax table form (the interpreted
    // HOF column form was the single slowest bench entry in round 4).
    "q23_lang_id" -> Q(
      (s, dir) => TextFunctions.langIdTable(
          t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
          "text", "doc_id")
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted")),
      Some {
        val markers = TextFunctions.LangMarkers.toSeq.sortBy(_._1)
        val scoreExprs = markers.map { case (l, ws) =>
          s"len(list_filter($DTOKENS, x -> x IN (${ws.map(w => s"'$w'").mkString(",")}))) AS s_$l"
        }.mkString(",\n    ")
        val langsDesc = markers.map(_._1).reverse // alphabetically largest first
        val best = langsDesc.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
        s"""WITH scored AS (SELECT doc_id, lang,
           |    $scoreExprs
           |  FROM documents),
           |best AS (SELECT doc_id, lang,
           |    greatest(${markers.map("s_" + _._1).mkString(",")}) AS m,
           |    ${markers.map("s_" + _._1).mkString(",")}
           |  FROM scored)
           |SELECT lang, CASE WHEN m <= 0 THEN 'und' $best END AS predicted, COUNT(*) AS n
           |FROM best GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
      }),

    // composed corpus-cleaning pipeline: exact dedup (min-id keeper over
    // a salted union) -> quality filter (punctuation + length) -> per-
    // language stats. The shape of a real pre-training data pass; every
    // stage is SQL-expressible so the oracle checks the composition.
    // near-dup REMOVAL end-to-end — the full production chain: minhash
    // LSH candidates → exact-Jaccard verify (inside minhashPairs) →
    // connected components → keep the min-id representative per
    // cluster. Corpus plants two mutated copies of each doc < 50
    // (pairwise Jaccard ≈ 0.99 ⇒ banded recall effectively certain; a
    // DuckDB sweep confirms NO coincidental cross-doc pair reaches the
    // 0.9 threshold), docs 50-79 ride along as singletons. The oracle
    // re-derives survivors from the EXACT O(n²) Jaccard pair graph and
    // a recursive-CTE CC — a missed LSH edge, a verify bug, or a wrong
    // cluster label all change the survivor set
    "q39_neardup_removal" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents").where(col("doc_id") < 80)
          .select(col("doc_id"), col("text"))
        val m1 = d.where(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 100000)
          .withColumn("text", concat(col("text"), lit(" x")))
        val m2 = d.where(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 200000)
          .withColumn("text", concat(col("text"), lit(" y")))
        val corpus = d.unionByName(m1).unionByName(m2)
        val pairs = Dedup.minhashPairs(corpus, "text", "doc_id",
            shingleSize = 5, numHashes = 32, bands = 8, threshold = 0.9)
          .select(col("id_a"), col("id_b"))
        val clusters = Dedup.dupClusters(
          corpus.select(col("doc_id").as("id")), pairs)
        clusters.where(col("id") === col("cluster"))
          .select(col("id").as("doc_id")).orderBy(col("doc_id"))
      },
      Some("""WITH raw AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id < 80),
             |corpus AS (
             |  SELECT doc_id, text FROM raw
             |  UNION ALL SELECT doc_id + 100000, text || ' x' FROM raw WHERE doc_id < 50
             |  UNION ALL SELECT doc_id + 200000, text || ' y' FROM raw WHERE doc_id < 50),
             |sh AS (
             |  SELECT doc_id, (CASE WHEN len(s) <= 4 THEN [s]
             |    ELSE list_distinct(list_transform(range(1, len(s)-3),
             |           i -> substring(s, i, 5))) END) AS g
             |  FROM (SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS s
             |        FROM corpus)),
             |pairs AS (
             |  SELECT a.doc_id AS src, b.doc_id AS dst
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.g, b.g)) * 1.0
             |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.9),
             |bidir AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
             |reach AS (
             |  WITH RECURSIVE r(id, lbl) AS (
             |    SELECT doc_id, doc_id FROM corpus
             |    UNION
             |    SELECT b.dst, r.lbl FROM bidir b JOIN r ON b.src = r.id)
             |  SELECT id, MIN(lbl) AS cluster FROM r GROUP BY id)
             |SELECT id AS doc_id FROM reach WHERE id = cluster ORDER BY doc_id""".stripMargin)),

    "q38_clean_pipeline" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val dups = d.where(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 100000)
        val deduped = Dedup.exact(d.unionByName(dups), Seq("text"), "doc_id")
        deduped
          .withColumn("toks", TextFunctions.wordTokens(col("text")))
          .where(TextFunctions.punctRatio(col("text")) < 0.08 && size(col("toks")) >= 30)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("docs"), sum(size(col("toks")).cast("long")).as("words"))
          .orderBy(col("lang"))
      },
      // the oracle must ALSO dedup: the salted copies dedup against
      // their originals at any SF, and at sf>=0.1 the corpus itself
      // contains exact-duplicate texts whose min-id keeper the Spark
      // side retains (caught by an sf0.1 sweep — sf0.01 has no
      // intrinsic dups and hid the assumption)
      Some(s"""WITH keep AS (
              |  SELECT lang, text FROM documents
              |  QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1)
              |SELECT lang, COUNT(*) AS docs, CAST(SUM(len($DTOKENS)) AS BIGINT) AS words
              |FROM keep
              |WHERE (CASE WHEN len(text) = 0 THEN 0.0
              |    ELSE (len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / len(text) END) < 0.08
              |  AND len($DTOKENS) >= 30
              |GROUP BY lang ORDER BY lang""".stripMargin)),

    // document chunking: token windows with overlap — one row per chunk
    // (the pre-training context-window prep pass); DuckDB dual slices
    // the same token lists
    "q63_chunking" -> Q(
      (s, dir) => {
        import graft.operators.Chunking
        Chunking.chunkDocuments(
            t(s, dir, "documents").where(col("doc_id") < 300), "text", "doc_id",
            maxTokens = 64, overlap = 8)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("chunks"),
            sum(size(TextFunctions.wordTokens(col("chunk_text"))).cast("long")).as("chunk_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, $DTOKENS AS t FROM documents WHERE doc_id < 300),
              |counts AS (
              |  SELECT doc_id, t, GREATEST(CAST(CEIL((len(t) - 8) / 56.0) AS INT), 1) AS nc
              |  FROM toks),
              |chunks AS (
              |  SELECT doc_id, unnest(range(0, nc)) AS i, t FROM counts)
              |SELECT doc_id, COUNT(*) AS chunks,
              |  CAST(SUM(len(list_slice(t, i * 56 + 1, i * 56 + 64))) AS BIGINT) AS chunk_tokens
              |FROM chunks GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // sequence packing: chunks greedily filled into 512-token context
    // windows (partition-dependent assignment, rows-only) — budget and
    // density invariants asserted in-plan
    "q65_sequence_packing" -> Q(
      (s, dir) => {
        import graft.operators.Chunking
        val chunks = Chunking.chunkDocuments(
            t(s, dir, "documents").where(col("doc_id") < 300), "text", "doc_id",
            maxTokens = 128)
          .withColumn("tokens", size(TextFunctions.wordTokens(col("chunk_text"))))
        val packed = Chunking.packSequences(chunks, "tokens", maxTokensPerPack = 512)
        val byPack = packed.groupBy(col("pack_id"))
          .agg(sum(col("pack_tokens")).as("pack_fill"))
        val worst = byPack.agg(max(col("pack_fill"))).collect()(0).getLong(0)
        require(worst <= 512, s"pack overflow: $worst tokens")
        val nChunks = packed.count()
        val nPacks = byPack.count()
        require(nPacks < nChunks, s"packing not denser than input: $nPacks vs $nChunks")
        import s.implicits._
        Seq((nChunks, worst <= 512, nPacks < nChunks))
          .toDF("chunks", "no_overflow", "denser_than_input")
      },
      None),

    // offset-based packing: the deterministic, closed-form packing dual
    // — same chunker as q65, but pack = floor(startOffset/512) over the
    // (doc_id, chunk_index) ordering, which DuckDB re-derives exactly
    // with one window cumsum (first-fit q65 stays rows-only; this pins
    // the packing pipeline's arithmetic cross-engine)
    "q65b_packing_offset" -> Q(
      (s, dir) => {
        import graft.operators.Chunking
        val chunks = Chunking.chunkDocuments(
            t(s, dir, "documents").where(col("doc_id") < 300), "text", "doc_id",
            maxTokens = 128)
          .withColumn("tokens", size(TextFunctions.wordTokens(col("chunk_text"))))
        Chunking.packSequencesByOffset(chunks, "tokens", maxTokensPerPack = 512,
            orderCols = Seq("doc_id", "chunk_index"))
          .groupBy(col("pack_id"))
          .agg(count(lit(1)).as("chunks"), sum(col("tokens").cast("long")).as("pack_tokens"))
          .orderBy(col("pack_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, $DTOKENS AS t FROM documents WHERE doc_id < 300),
              |counts AS (
              |  SELECT doc_id, t, GREATEST(CAST(CEIL(len(t) / 128.0) AS INT), 1) AS nc
              |  FROM toks),
              |chunks AS (
              |  SELECT doc_id, unnest(range(0, nc)) AS i, t FROM counts),
              |sized AS (
              |  SELECT doc_id, i, len(list_slice(t, i * 128 + 1, i * 128 + 128)) AS tokens
              |  FROM chunks),
              |cum AS (
              |  SELECT tokens, COALESCE(SUM(tokens) OVER (ORDER BY doc_id, i
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
              |  FROM sized)
              |SELECT CAST(FLOOR(start / 512.0) AS BIGINT) AS pack_id,
              |  COUNT(*) AS chunks, CAST(SUM(tokens) AS BIGINT) AS pack_tokens
              |FROM cum GROUP BY 1 ORDER BY pack_id""".stripMargin)),

    // deterministic train/val/test assignment (hash-based, rows-only:
    // xxhash64 has no DuckDB dual) — proportions asserted in-plan
    "q64_dataset_splits" -> Q(
      (s, dir) => {
        import graft.operators.Chunking
        val assigned = Chunking.assignSplits(t(s, dir, "documents"), "doc_id")
        val counts = assigned.groupBy(col("split")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val total = counts.values.sum.toDouble
        require(counts("train") / total > 0.8 && counts("train") / total < 0.97,
          s"train fraction off: $counts")
        require(counts.keySet == Set("train", "val", "test"), s"splits: $counts")
        assigned.groupBy(col("split")).agg(count(lit(1)).as("n")).orderBy(col("split"))
      },
      None),

    // portable-hash splits: md5-derived buckets are re-derivable in any
    // engine with md5, so the whole ladder (weights, boundaries, names)
    // is oracle-checked exactly
    "q64b_split_portable" -> Q(
      (s, dir) => {
        import graft.operators.Chunking
        Chunking.assignSplits(t(s, dir, "documents"), "doc_id", portableHash = true)
          .groupBy(col("split")).agg(count(lit(1)).as("n")).orderBy(col("split"))
      },
      Some("""WITH h AS (
             |  SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
             |         % 100 AS b
             |  FROM documents)
             |SELECT CASE WHEN b < 90 THEN 'train'
             |            WHEN b < 95 THEN 'val'
             |            ELSE 'test' END AS split, COUNT(*) AS n
             |FROM h GROUP BY 1 ORDER BY split""".stripMargin)),

    // repetition quality signals (Gopher/C4-style): fraction of word
    // bigrams/trigrams that repeat an earlier occurrence — the
    // boilerplate / degenerate-text detector
    "q66_repetition" -> Q(
      (s, dir) => t(s, dir, "documents")
        .where(col("doc_id") < 200)
        .select(col("doc_id"),
          round(TextFunctions.repeatedNgramFraction(col("text"), 2), 4).as("rep2"),
          round(TextFunctions.repeatedNgramFraction(col("text"), 3), 4).as("rep3"))
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (SELECT doc_id, $DTOKENS AS t FROM documents WHERE doc_id < 200)
              |SELECT doc_id,
              |  ROUND(CASE WHEN len(t) < 2 THEN 0.0
              |    ELSE 1.0 - len(list_distinct(list_transform(range(1, len(t)),
              |           i -> t[i] || ' ' || t[i+1]))) * 1.0 / (len(t) - 1) END, 4) AS rep2,
              |  ROUND(CASE WHEN len(t) < 3 THEN 0.0
              |    ELSE 1.0 - len(list_distinct(list_transform(range(1, len(t) - 1),
              |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) * 1.0 / (len(t) - 2) END, 4) AS rep3
              |FROM toks ORDER BY doc_id""".stripMargin)),

    // PII scrubbing: deterministic synthetic PII (email/phone/IPv4)
    // appended per row, redacted with RE2-compatible patterns — the
    // oracle applies the identical replacements, pinning pattern
    // semantics and replacement order (email, then IP, then phone)
    "q67_pii_redact" -> Q(
      (s, dir) => t(s, dir, "documents")
        .where(col("doc_id") < 50)
        .select(col("doc_id"),
          TextFunctions.redactPii(concat(
            substring(col("text"), 1, 40),
            lit(" contact user"), col("doc_id"), lit("@mail.example.com"),
            lit(" call +1 (555) 010-"), col("doc_id") + 1000,
            lit(" from 192.168.0."), pmod(col("doc_id"), lit(256)))).as("clean"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(
             |        substring(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
             |          || '@mail.example.com call +1 (555) 010-' || CAST(doc_id + 1000 AS VARCHAR)
             |          || ' from 192.168.0.' || CAST(doc_id % 256 AS VARCHAR),
             |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
             |    '\+?[0-9][0-9(). -]{6,14}[0-9]', '[PHONE]', 'g') AS clean
             |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin)),

    // benchmark-contamination check: train docs sharing any word 5-gram
    // with the "benchmark" (docs 0-9) — broadcast semi join on the gram
    // set, the eval-leakage pass before training
    "q68_contamination" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val bench = d.where(col("doc_id") < 10)
        val train = d.where(col("doc_id") >= 10 && col("doc_id") < 500)
        Dedup.flagContaminated(train, bench, "text", "doc_id", n = 5)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $DTOKENS AS t FROM documents),
              |g AS (SELECT doc_id,
              |  CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
              |       ELSE list_distinct(list_transform(range(1, len(t) - 3),
              |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
              |                   || t[i+3] || ' ' || t[i+4])) END AS gs
              |  FROM toks),
              |bg AS (SELECT DISTINCT unnest(gs) AS gm FROM g WHERE doc_id < 10),
              |tg AS (SELECT doc_id, unnest(gs) AS gm FROM g
              |       WHERE doc_id >= 10 AND doc_id < 500)
              |SELECT DISTINCT doc_id FROM tg JOIN bg USING (gm) ORDER BY doc_id""".stripMargin)),

    // contamination at beyond-broadcast reference scale: bloom filter
    // prunes the corpus map-side, exact semi join verifies the
    // fpp-bounded candidates — output must EXACTLY equal q68's, so the
    // same oracle gates the bloom path (a false positive surviving the
    // verify, or a bloom miss dropping a true hit, both hash-fail here)
    "q68b_contamination_bloom" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val bench = d.where(col("doc_id") < 10)
        val train = d.where(col("doc_id") >= 10 && col("doc_id") < 500)
        Dedup.flagContaminatedBloom(train, bench, "text", "doc_id", n = 5)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $DTOKENS AS t FROM documents),
              |g AS (SELECT doc_id,
              |  CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
              |       ELSE list_distinct(list_transform(range(1, len(t) - 3),
              |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
              |                   || t[i+3] || ' ' || t[i+4])) END AS gs
              |  FROM toks),
              |bg AS (SELECT DISTINCT unnest(gs) AS gm FROM g WHERE doc_id < 10),
              |tg AS (SELECT doc_id, unnest(gs) AS gm FROM g
              |       WHERE doc_id >= 10 AND doc_id < 500)
              |SELECT DISTINCT doc_id FROM tg JOIN bg USING (gm) ORDER BY doc_id""".stripMargin)),

    // stratified sampling: per-language deterministic rates over the
    // portable md5 bucket, so the exact kept-set is re-derivable in SQL
    // deterministic LLM data mixing: repeat src0 2.3x (2 epochs + 30%
    // extra-epoch sample), subsample src1 to 40%, drop src2, keep the
    // rest — per-source counts and epoch sums re-derived in DuckDB
    // from the same md5 per-mille rule
    "q88_source_mixing" -> Q(
      (s, dir) => {
        import graft.operators.Chunking
        Chunking.mixSources(t(s, dir, "documents"), "source", "doc_id",
            multiplicity = Map("src0" -> 2.3, "src1" -> 0.4, "src2" -> 0.0),
            default = 1.0, portableHash = true)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("_epoch")).cast("long").as("epoch_sum"))
          .orderBy(col("source"))
      },
      Some("""WITH h AS (
             |  SELECT source,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
             |    % 1000 AS b
             |  FROM documents),
             |c AS (
             |  SELECT source,
             |    (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 WHEN 'src2' THEN 0
             |                 ELSE 1 END)
             |    + (CASE WHEN b < (CASE source WHEN 'src0' THEN 300 WHEN 'src1' THEN 400
             |                                  ELSE 0 END)
             |       THEN 1 ELSE 0 END) AS copies
             |  FROM h)
             |SELECT source, CAST(SUM(copies) AS BIGINT) AS n,
             |       CAST(SUM(copies * (copies - 1) // 2) AS BIGINT) AS epoch_sum
             |FROM c WHERE copies > 0 GROUP BY source ORDER BY source""".stripMargin)),

    "q69_stratified_sample" -> Q(
      (s, dir) => {
        import graft.operators.Chunking
        Chunking.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
            rates = Map("en" -> 60, "de" -> 30), default = 10, portableHash = true)
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang"))
      },
      Some("""WITH h AS (
             |  SELECT lang,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
             |    % 100 AS b
             |  FROM documents)
             |SELECT lang, COUNT(*) AS n FROM h
             |WHERE b < CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 30 ELSE 10 END
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // unigram log-probability quality score (KenLM-proxy): corpus
    // unigram frequencies -> per-doc mean log10 token probability.
    // Exactly TWO passes over the tokens: one aggregation builds the
    // vocab-sized freq table (checkpointed — the token total is a second
    // tiny aggregate OVER IT, not a separate corpus count()), one join
    // scores the docs. No broadcast hint: a web-corpus vocabulary can
    // exceed executor memory, so the join strategy is left to AQE's
    // runtime sizes (it broadcasts when the vocab is actually small).
    "q71_unigram_logprob" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          explode(TextFunctions.wordTokens(col("text"))).as("w"))
        // localCheckpoint, not persist: same one-tokenize guarantee, but
        // the blocks are ContextCleaner-GC'd when the frame goes out of
        // scope instead of pinning the CacheManager until session end
        val freqsRaw = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val total = freqsRaw.agg(sum(col("c"))).collect()(0).getLong(0).toDouble
        val freqs = freqsRaw.select(col("w"), log10(col("c") / total).as("lp"))
        toks.join(freqs, Seq("w"))
          .groupBy(col("doc_id"))
          .agg(round(avg(col("lp")), 4).as("mean_logprob"),
            count(lit(1)).as("tokens"))
          .where(col("doc_id") < 200)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest($DTOKENS) AS w FROM documents),
              |freqs AS (
              |  SELECT w, log10(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM toks)) AS lp
              |  FROM toks GROUP BY w)
              |SELECT doc_id, ROUND(AVG(lp), 4) AS mean_logprob, COUNT(*) AS tokens
              |FROM toks JOIN freqs USING (w)
              |WHERE doc_id < 200
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // bigram conditional log-probability (the KenLM-proxy one order up
    // from q71): P(w2|w1) = C(w1w2)/C(w1·) with counts over the
    // corpus's own bigrams (MLE — every scored bigram has C > 0 by
    // construction). Adjacent pairs come from one zip of the token
    // array (no positional self-join); two partial-aggregated count
    // shuffles build the model; scoring is a join on the bigram key.
    // The standard perplexity-style quality filter shape
    "q71b_bigram_logprob" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          TextFunctions.wordTokens(col("text")).as("ts"))
        val bigrams = toks.where(size(col("ts")) >= 2)
          .select(col("doc_id"), explode(
            zip_with(slice(col("ts"), lit(1), size(col("ts")) - 1),
                     slice(col("ts"), lit(2), size(col("ts")) - 1),
                     (a, b) => concat_ws(" ", a, b))).as("b"))
          .localCheckpoint(true) // read by model build AND scoring
        val cb = bigrams.groupBy(col("b")).agg(count(lit(1)).as("cb"))
        val c1 = bigrams
          .groupBy(substring_index(col("b"), " ", 1).as("w1"))
          .agg(count(lit(1)).as("c1"))
        val lp = cb.join(c1, substring_index(cb("b"), " ", 1) === c1("w1"))
          .select(col("b"), log10(col("cb") / col("c1")).as("lp"))
        bigrams.join(lp, Seq("b"))
          .groupBy(col("doc_id"))
          .agg(round(avg(col("lp")), 4).as("mean_bigram_logprob"),
            count(lit(1)).as("bigrams"))
          .where(col("doc_id") < 200)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, $DTOKENS AS t FROM documents),
              |bg AS (
              |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
              |    i -> t[i] || ' ' || t[i+1])) AS b
              |  FROM toks WHERE len(t) >= 2),
              |cb AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b),
              |c1 AS (SELECT split_part(b, ' ', 1) AS w1, COUNT(*) AS c1
              |       FROM bg GROUP BY 1),
              |lp AS (SELECT b, log10(cb.cb * 1.0 / c1.c1) AS lp
              |       FROM cb JOIN c1 ON split_part(cb.b, ' ', 1) = c1.w1)
              |SELECT doc_id, ROUND(AVG(lp), 4) AS mean_bigram_logprob,
              |       COUNT(*) AS bigrams
              |FROM bg JOIN lp USING (b)
              |WHERE doc_id < 200
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // chunk-level corpus dedup (C4's cross-document line dedup, with
    // 10-word windows standing in for lines): the corpus-wide first
    // occurrence of each chunk survives, later ones are cut and the
    // documents reassembled — the testdata's planted near-dups share
    // real chunks, so the filter has teeth without planting
    "q82_dedup_chunks" -> Q(
      (s, dir) =>
        Dedup.dedupChunks(t(s, dir, "documents"), "text", "doc_id", chunkWords = 10)
          .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
              |  SELECT doc_id, $DTOKENS AS ts FROM documents),
              |chunks AS (
              |  SELECT doc_id, i AS cidx,
              |         array_to_string(ts[(i*10+1):(i*10+10)], ' ') AS chunk
              |  FROM toks, LATERAL (SELECT unnest(range(
              |    CAST(ceil(len(ts) / 10.0) AS BIGINT))) AS i) u),
              |keep AS (
              |  SELECT doc_id, cidx, chunk,
              |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS rn
              |  FROM chunks),
              |agg AS (
              |  SELECT doc_id,
              |    count(*) FILTER (WHERE rn = 1) AS kept_chunks,
              |    count(*) FILTER (WHERE rn > 1) AS dropped_chunks,
              |    coalesce(string_agg(chunk, ' ' ORDER BY cidx)
              |      FILTER (WHERE rn = 1), '') AS dedup_text
              |  FROM keep GROUP BY doc_id)
              |SELECT d.doc_id,
              |  coalesce(kept_chunks, 0) AS kept_chunks,
              |  coalesce(dropped_chunks, 0) AS dropped_chunks,
              |  coalesce(dedup_text, '') AS dedup_text
              |FROM documents d LEFT JOIN agg USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // TF-IDF: top term per document by tf * log10(N/df) — explode,
    // two partial-aggregated shuffles, document-frequency join; ties
    // break lexicographically in both engines
    "q72_tfidf" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents").where(col("doc_id") < 100)
        val n = docs.count().toDouble
        val tf = docs.select(col("doc_id"),
            explode(TextFunctions.wordTokens(col("text"))).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        val scored = tf.join(broadcast(df_), Seq("w"))
          .select(col("doc_id"), col("w"),
            round(col("tf") * log10(lit(n) / col("df")), 6).as("tfidf"))
        val win = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("w"))
        scored.withColumn("rn", row_number().over(win))
          .where(col("rn") === 1).drop("rn")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id, $DTOKENS AS t FROM documents WHERE doc_id < 100),
              |tf AS (
              |  SELECT doc_id, w, COUNT(*) AS tf
              |  FROM (SELECT doc_id, unnest(t) AS w FROM d) GROUP BY doc_id, w),
              |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
              |scored AS (
              |  SELECT doc_id, w,
              |    ROUND(tf * log10((SELECT COUNT(*) FROM d) * 1.0 / df), 6) AS tfidf
              |  FROM tf JOIN df USING (w))
              |SELECT doc_id, w, tfidf FROM scored
              |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w) = 1
              |ORDER BY doc_id""".stripMargin)),

    // ---- dedup --------------------------------------------------------

    // exact dedup over a salted self-union (the corpus itself has no
    // exact dups): every doc_id<100 gains a copy at id+100000; the
    // keeper must be the original and dup_count 2
    "q24_dedup_exact" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val dups = d.where(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 100000)
        Dedup.exactGroups(d.unionByName(dups), "text", "doc_id")
          .select(col("keeper_id"), col("dup_count"))
          .orderBy(col("keeper_id"))
      },
      Some("""WITH unioned AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100)
             |SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS dup_count
             |FROM unioned GROUP BY text ORDER BY keeper_id""".stripMargin)),

    // incremental-ingest dedup: a batch (docs 250+, plus planted copies
    // of existing docs 0-49 under new ids) deduped against the
    // historical corpus (docs 0-249) — the planted 50 must drop, the
    // 250 genuinely-new must survive. Bloom pruning bounds what
    // shuffles; the exact anti join makes output EQUAL the plain
    // NOT EXISTS, which is what the oracle checks
    "q24b_dedup_incremental" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val existing = d.where(col("doc_id") < 250)
        val batch = d.where(col("doc_id") >= 250)
          .unionByName(d.where(col("doc_id") < 50)
            .withColumn("doc_id", col("doc_id") + 100000))
        Dedup.exactAgainst(batch, existing, Seq("text"), "doc_id")
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some("""WITH batch AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50)
             |SELECT doc_id FROM batch b
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM documents e WHERE e.doc_id < 250 AND e.text = b.text)
             |ORDER BY doc_id""".stripMargin)),

    // exact-dedup row survival count over events (composite key)
    "q25_dedup_rows" -> Q(
      (s, dir) => {
        val e = events(s, dir)
        val deduped = Dedup.exact(e, Seq("user_id", "event_type"), "event_id")
        deduped.agg(count(lit(1)).as("survivors"))
      },
      Some("""SELECT COUNT(*) AS survivors FROM (
             |  SELECT user_id, event_type, MIN(event_id) FROM events
             |  GROUP BY user_id, event_type)""".stripMargin)),

    // n-gram Jaccard near-dup over salted mutations: each doc_id<50
    // gets a copy with one word appended; pairs must be found with
    // jaccard > 0.5
    "q26_ngram_jaccard" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents").where(col("doc_id") < 50)
          .select(col("doc_id"), col("text"))
        val mutated = d
          .withColumn("doc_id", col("doc_id") + 100000)
          .withColumn("text", concat(col("text"), lit(" graftmarker")))
        val all = d.unionByName(mutated)
        val pairs = all.select(col("doc_id").as("id_a")).where(col("id_a") < 50)
          .withColumn("id_b", col("id_a") + 100000)
        Dedup.ngramJaccardVerify(all, pairs, "text", "doc_id", n = 3)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
          .orderBy(col("id_a"))
      },
      Some {
        val g = (t: String) =>
          s"""list_distinct(list_transform(
             |  range(1, greatest(len(list_filter(string_split_regex(lower($t), '[^a-z0-9'']+'), x -> len(x) > 0)) - 2, 1) + 1),
             |  i -> array_to_string(list_slice(list_filter(string_split_regex(lower($t), '[^a-z0-9'']+'), x -> len(x) > 0), i, i + 2), ' ')))""".stripMargin
        s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
           |pairs AS (SELECT a.doc_id AS id_a, a.doc_id + 100000 AS id_b,
           |    ${g("a.text")} AS ga,
           |    ${g("a.text || ' graftmarker'")} AS gb
           |  FROM base a)
           |SELECT id_a, id_b,
           |  ROUND(CASE WHEN len(list_distinct(ga || gb)) = 0 THEN 0.0
           |    ELSE len(list_intersect(ga, gb)) * 1.0 / len(list_distinct(ga || gb)) END, 4) AS jaccard
           |FROM pairs ORDER BY id_a""".stripMargin
      }),

    // MinHash/LSH near-dup: hash-based, no SQL dual — assert the planted
    // near-identical pairs are recovered (internal consistency)
    "q27_minhash_lsh" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents").where(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val mutated = d
          .withColumn("doc_id", col("doc_id") + 100000)
          .withColumn("text", concat(col("text"), lit(" x")))
        val pairs = Dedup.minhashPairs(d.unionByName(mutated), "text", "doc_id",
          shingleSize = 5, numHashes = 32, bands = 8, threshold = 0.5)
        pairs.where(col("id_b") === col("id_a") + 100000)
          .select(col("id_a"), col("id_b"))
          .orderBy(col("id_a"))
      },
      // exact-Jaccard dual: the oracle recomputes 5-char shingle Jaccard
      // for each (doc, doc+" x") pair in SQL. Appending 2 chars to these
      // documents keeps Jaccard near 1, so 8-band/4-row LSH recall is
      // effectively certain and the banded path must reproduce the exact
      // answer (a genuinely-borderline pair could make LSH probabilistic
      // — this dataset has none).
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    regexp_replace(lower(text), '\s+', ' ', 'g') AS s,
             |    regexp_replace(lower(text || ' x'), '\s+', ' ', 'g') AS s2
             |  FROM documents WHERE doc_id < 100),
             |sh AS (
             |  SELECT doc_id,
             |    CASE WHEN len(s) <= 4 THEN [s]
             |         ELSE list_distinct(list_transform(range(1, len(s) - 3),
             |                i -> substring(s, i, 5))) END AS a,
             |    CASE WHEN len(s2) <= 4 THEN [s2]
             |         ELSE list_distinct(list_transform(range(1, len(s2) - 3),
             |                i -> substring(s2, i, 5))) END AS b
             |  FROM d)
             |SELECT doc_id AS id_a, doc_id + 100000 AS id_b
             |FROM sh
             |WHERE len(list_distinct(list_concat(a, b))) > 0
             |  AND len(list_intersect(a, b)) * 1.0
             |      / len(list_distinct(list_concat(a, b))) >= 0.5
             |ORDER BY id_a""".stripMargin)),

    "q28_simhash" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents").where(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val mutated = d
          .withColumn("doc_id", col("doc_id") + 100000)
          .withColumn("text", concat(col("text"), lit(" x")))
        Dedup.simhashPairs(d.unionByName(mutated), "text", "doc_id", maxHamming = 3)
          .where(col("id_b") === col("id_a") + 100000)
          .select(col("id_a"), col("id_b"), col("hamming"))
          .orderBy(col("id_a"))
      },
      None),

    // portable-hash simhash dual (the q64b trick applied to simhash):
    // same explode + bit-sum + sign pipeline as q28, but tokens hashed
    // with a 60-bit md5-derived value both engines can compute, so the
    // FINGERPRINTS themselves are oracle-checked value-for-value — the
    // production q28 path differs only in the token-hash function
    // (xxhash64) and bit width
    "q28b_simhash_portable" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.types.LongType
        val d = t(s, dir, "documents").where(col("doc_id") < 50)
        Dedup.simhashTable(d, "text", "doc_id", bits = 60,
            tokenHash = w => conv(substring(md5(w), 1, 15), 16, 10).cast(LongType))
          .select(col("id").as("doc_id"), col("fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest($DTOKENS) AS w
              |  FROM documents WHERE doc_id < 50),
              |h AS (
              |  SELECT doc_id,
              |    CAST(('0x' || substring(md5(w), 1, 15)) AS UBIGINT) AS h
              |  FROM toks),
              |b AS (
              |  SELECT doc_id,
              |    ${(0 until 60).map(i =>
                     s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
                     .mkString(",\n    ")}
              |  FROM h GROUP BY doc_id),
              |fpt AS (
              |  SELECT doc_id,
              |    ${(0 until 60).map(i =>
                     s"(CASE WHEN s$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END)")
                     .mkString(" +\n    ")} AS fp
              |  FROM b)
              |SELECT d.doc_id, COALESCE(f.fp, 0) AS fp
              |FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d
              |LEFT JOIN fpt f USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    // document fingerprints: xxhash64/rolling-hash duplicate detection —
    // oracle checks the SHAPE (each salted copy collides with its
    // original): count of fingerprint groups of size 2
    "q29_fingerprint" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val dups = d.where(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 100000)
        d.unionByName(dups)
          .select(TextFunctions.fingerprint(col("text")).as("fp"),
            TextFunctions.rollingHash(col("text")).as("rh"))
          .groupBy(col("fp"), col("rh")).agg(count(lit(1)).as("n"))
          .groupBy(col("n")).agg(count(lit(1)).as("groups"))
          .orderBy(col("n"))
      },
      Some("""WITH unioned AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100)
             |SELECT n, COUNT(*) AS groups FROM (
             |  SELECT text, COUNT(*) AS n FROM unioned GROUP BY text)
             |GROUP BY n ORDER BY n""".stripMargin)),

    // embedding-cosine near-dup: random-hyperplane LSH buckets + cosine
    // verify (hash-based bucketing, no SQL dual) — planted exact copies
    // (cosine 1.0) land in the same bucket by construction and must all
    // be recovered
    "q36_embed_neardup" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings").where(col("vec_id") < 100)
          .select(col("vec_id"), col("embedding"))
        val copies = e.withColumn("vec_id", col("vec_id") + 100000)
        val pairs = Dedup.embeddingPairs(e.unionByName(copies), "embedding", "vec_id",
          planes = 6, threshold = 0.999)
        pairs.where(col("id_b") === col("id_a") + 100000)
          .select(col("id_a"), col("id_b"))
          .orderBy(col("id_a"))
      },
      // identical copies land in the same hyperplane bucket by
      // construction and cosine(v, v) ≈ 1, so recall is provably total:
      // the oracle is every nonzero vector's (id, id+100000) pair (zero
      // vectors get cosine 0 in Spark and are excluded on both sides)
      Some("""SELECT vec_id AS id_a, vec_id + 100000 AS id_b
             |FROM embeddings
             |WHERE vec_id < 100
             |  AND list_sum(list_transform(embedding,
             |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
             |ORDER BY id_a""".stripMargin)),

    // SemDeDup semantic dedup: plant exact copies of the corpus under
    // offset ids. Identical vectors always co-cluster (same vector =>
    // same nearest centroid) and cosine(v, v) = 1 > 0.999, so every
    // copy is provably dropped in favor of its lower-id original, while
    // random 64-dim embeddings never reach 0.999 pairwise — survivors
    // are exactly the originals (plus copies of all-zero vectors, whose
    // guarded cosine is 0; the oracle carries the same branch).
    "q100_semantic_dedup" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings").where(col("vec_id") < 150)
          .select(col("vec_id"), col("embedding"))
        val copies = e.withColumn("vec_id", col("vec_id") + 100000)
        Dedup.semanticDedup(e.unionByName(copies), "embedding", "vec_id",
          k = 8, threshold = 0.999)
          .select(col("vec_id"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id FROM embeddings WHERE vec_id < 150
             |UNION ALL
             |SELECT vec_id + 100000 AS vec_id FROM embeddings
             |WHERE vec_id < 150
             |  AND list_sum(list_transform(embedding,
             |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
             |ORDER BY vec_id""".stripMargin)),

    // ---- similarity search -------------------------------------------

    // brute-force cosine scores against a fixed query vector
    "q30_cosine_scores" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qvec = e.where(col("vec_id") === 0)
          .select(col("embedding")).collect()(0)
          .getSeq[Float](0)
        val q = array(qvec.map(lit): _*)
        e.where(col("vec_id") < 200)
          .select(col("vec_id"),
            round(Similarity.cosine(col("embedding"), q), 4).as("cos"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id,
             |  ROUND(list_cosine_similarity(
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
             |    (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE))
             |     FROM embeddings WHERE vec_id = 0)), 4) AS cos
             |FROM embeddings WHERE vec_id < 200 ORDER BY vec_id""".stripMargin)),

    // exact top-k (rounded scores make cross-engine ordering exact)
    "q31_cosine_topk" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qvec = e.where(col("vec_id") === 0)
          .select(col("embedding")).collect()(0)
          .getSeq[Float](0)
        val q = array(qvec.map(lit): _*)
        e.select(col("vec_id"),
            round(Similarity.cosine(col("embedding"), q), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(20)
      },
      Some("""SELECT vec_id,
             |  ROUND(list_cosine_similarity(
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
             |    (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE))
             |     FROM embeddings WHERE vec_id = 0)), 4) AS cos
             |FROM embeddings ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin)),

    // int8-quantized ANN: rank on 4x-smaller codes, exact-refine the
    // candidate slice — the refined top-20 must EQUAL the exact
    // top-20, so the oracle is DuckDB's brute force (same as q31),
    // making the quantization+refinement loop hash-gated end to end
    "q86_quantized_ann" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qvec = e.where(col("vec_id") === 0)
          .select(col("embedding")).collect()(0)
          .getSeq[Float](0)
        Similarity.quantizedTopK(e, "embedding", "vec_id", qvec, k = 20, refine = 8)
          .select(col("vec_id"), round(col("score"), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
      },
      Some("""SELECT vec_id,
             |  ROUND(list_cosine_similarity(
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
             |    (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE))
             |     FROM embeddings WHERE vec_id = 0)), 4) AS cos
             |FROM embeddings ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin)),

    // LSH-bucketed ANN under a full oracle (graduated from no_oracle,
    // round-10 verdict item 4): 10 near-duplicates of the query are
    // planted with PORTABLE md5-derived scaling (cos ~0.9999 — the
    // exact top-10 is provably the planted set), lshTopK must recall
    // ≥0.8 of them at tight pruning (asserted in-plan: a bucket-math,
    // probe-order, or hash-family bug scatters near-parallel vectors),
    // and the HASHED rows are the exact top-10 over the augmented
    // corpus — both engines construct identical planted floats and
    // identical cosine ladders, so the value is checked cross-engine
    "q32_ann_lsh" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qvec = e.where(col("vec_id") === 0)
          .select(col("embedding")).collect()(0)
          .getSeq[Float](0)
        val plantedDf = plantedNearDups(s, e, baseId = 0L, prefix = 9000000L)
        val corpus = e.where(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding"))
          .unionByName(plantedDf)
        val exactIds = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", qvec, 10)
          .select(col("vec_id"))
        val lsh = Similarity.lshTopK(corpus, "embedding", "vec_id", qvec, 10,
          planes = 6, multiprobe = 2, tables = 2).select(col("vec_id"))
        val recall = exactIds.join(lsh, Seq("vec_id"), "left_semi").count() / 10.0
        require(recall >= 0.8, s"LSH recall@10 $recall < 0.8 on planted neighbors")
        val q = array(qvec.map(lit): _*)
        corpus.select(col("vec_id"),
            round(Similarity.cosine(col("embedding"), q), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some(plantedTopKSql(baseId = 0, prefix = 9000000))),

    // duplicate-cluster assignment: connected components over a dup-pair
    // graph (chains force transitivity), oracled by a DuckDB recursive
    // CTE computing the same min-reachable-id labels. Edges derive
    // arithmetically from the documents table so both engines see the
    // identical graph; the operator under test is the distributed
    // label-propagation itself
    "q75_dup_clusters" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents").where(col("doc_id") < 150)
          .select(col("doc_id").as("id"))
        // pair graph: i—(i+50) for i<50, and (i+50)—(i+100) for i<25:
        // 25 three-node chains, 25 two-node pairs, 25 singletons
        val e1 = d.where(col("id") < 50)
          .select(col("id").as("id_a"), (col("id") + 50).as("id_b"))
        val e2 = d.where(col("id") < 25)
          .select((col("id") + 50).as("id_a"), (col("id") + 100).as("id_b"))
        Dedup.dupClusters(d, e1.unionByName(e2))
          .orderBy(col("id"))
      },
      Some("""WITH nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 150),
             |edges AS (
             |  SELECT id AS src, id + 50 AS dst FROM nodes WHERE id < 50
             |  UNION ALL SELECT id + 50, id + 100 FROM nodes WHERE id < 25),
             |bidir AS (
             |  SELECT src, dst FROM edges
             |  UNION ALL SELECT dst, src FROM edges),
             |reach AS (
             |  WITH RECURSIVE r(id, lbl) AS (
             |    SELECT id, id FROM nodes
             |    UNION
             |    SELECT b.dst, r.lbl FROM bidir b JOIN r ON b.src = r.id)
             |  SELECT id, MIN(lbl) AS cluster FROM r GROUP BY id)
             |SELECT id, cluster FROM reach ORDER BY id""".stripMargin)),

    // the graft_* SQL function surface end-to-end: a pure spark.sql
    // query through the extension-registered bindings (SqlFunctions),
    // oracle-checked against the same duals as the Column forms — pins
    // registration, argument binding, and the one-definition contract
    "q77_sql_text_fns" -> Q(
      (s, dir) => {
        t(s, dir, "documents").createOrReplaceTempView("q77_docs")
        s.sql("""SELECT doc_id,
                |  graft_token_count(text) AS tokens,
                |  ROUND(graft_punct_ratio(text), 4) AS punct_ratio,
                |  ROUND(graft_repeated_ngram_fraction(text, 2), 4) AS rep2
                |FROM q77_docs WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)
      },
      Some(s"""WITH toks AS (SELECT doc_id, text, $DTOKENS AS t FROM documents WHERE doc_id < 200)
              |SELECT doc_id,
              |  len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS tokens,
              |  ROUND(CASE WHEN len(text) = 0 THEN 0.0
              |    ELSE (len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / len(text) END, 4) AS punct_ratio,
              |  ROUND(CASE WHEN len(t) < 2 THEN 0.0
              |    ELSE 1.0 - len(list_distinct(list_transform(range(1, len(t)),
              |           i -> t[i] || ' ' || t[i+1]))) * 1.0 / (len(t) - 1) END, 4) AS rep2
              |FROM toks ORDER BY doc_id""".stripMargin)),

    // portable-hash ANN dual (q64b/q28b trick applied to similarity
    // search): hyperplane components derived from md5(plane_dim) so
    // BOTH engines compute identical buckets, then identical
    // within-bucket cosine top-5 — the bucket-prune + verify pipeline
    // of q32, oracle-checked value-for-value. The production path
    // (q32) differs only in the plane-component hash (xxhash64).
    "q32c_ann_portable" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.Column
        val planes = 4
        val e = t(s, dir, "embeddings").where(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding").as("v"))
        def planeComp(p: Int, d: Column): Column =
          (conv(substring(md5(concat(lit(s"${p}_"), d.cast("string"))), 1, 15), 16, 10)
            .cast("long") % 1000).cast("double") / 1000.0 - 0.5
        def dotPlane(p: Int): Column = aggregate(
          zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
            (x, d) => x.cast("double") * planeComp(p, d)),
          lit(0.0), (acc, x) => acc + x)
        val bucketed = e.withColumn("bucket",
          (0 until planes).map(p =>
            when(dotPlane(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
            .reduce(_ + _))
        val q = bucketed.where(col("vec_id") === 7)
          .select(col("v").as("qv"), col("bucket").as("qb"))
        bucketed.where(col("vec_id") =!= 7)
          .crossJoin(broadcast(q))
          .where(col("bucket") === col("qb"))
          .select(col("vec_id"),
            round(
              aggregate(zip_with(col("v"), col("qv"),
                (x, y) => x.cast("double") * y.cast("double")),
                lit(0.0), (a, x) => a + x) /
              (sqrt(aggregate(transform(col("v"), x => x.cast("double") * x.cast("double")),
                lit(0.0), (a, x) => a + x)) *
               sqrt(aggregate(transform(col("qv"), x => x.cast("double") * x.cast("double")),
                lit(0.0), (a, x) => a + x))), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(5)
      },
      Some("""WITH e AS (
             |  SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < 200),
             |b AS (
             |  SELECT vec_id, v,
             |    (CASE WHEN list_sum(list_transform(range(0, len(v)),
             |       d -> v[d+1] * (CAST(('0x' || substring(md5('0_' || d), 1, 15)) AS UBIGINT) % 1000 / 1000.0 - 0.5))) >= 0 THEN 1 ELSE 0 END)
             |  + 2 * (CASE WHEN list_sum(list_transform(range(0, len(v)),
             |       d -> v[d+1] * (CAST(('0x' || substring(md5('1_' || d), 1, 15)) AS UBIGINT) % 1000 / 1000.0 - 0.5))) >= 0 THEN 1 ELSE 0 END)
             |  + 4 * (CASE WHEN list_sum(list_transform(range(0, len(v)),
             |       d -> v[d+1] * (CAST(('0x' || substring(md5('2_' || d), 1, 15)) AS UBIGINT) % 1000 / 1000.0 - 0.5))) >= 0 THEN 1 ELSE 0 END)
             |  + 8 * (CASE WHEN list_sum(list_transform(range(0, len(v)),
             |       d -> v[d+1] * (CAST(('0x' || substring(md5('3_' || d), 1, 15)) AS UBIGINT) % 1000 / 1000.0 - 0.5))) >= 0 THEN 1 ELSE 0 END)
             |    AS bucket
             |  FROM e),
             |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 7)
             |SELECT b.vec_id,
             |  ROUND(
             |    list_sum(list_transform(range(0, len(b.v)), d -> b.v[d+1] * q.qv[d+1]))
             |    / (sqrt(list_sum(list_transform(b.v, x -> x * x)))
             |       * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS cos
             |FROM b, q
             |WHERE b.bucket = q.qb AND b.vec_id <> 7
             |ORDER BY cos DESC, b.vec_id LIMIT 5""".stripMargin)),

    // IVF ANN under a full oracle (graduated from no_oracle like q32):
    // planted near-duplicates of vec 1, quantizer trained on a 25% hash
    // sample (the corpus-scale path), assignment covering every vector;
    // ivfTopK must recall ≥0.8 of the planted set at nprobe=2 (asserted
    // in-plan — near-parallel vectors share coarse cells), and the
    // hashed rows are the exact top-10 over the augmented corpus,
    // cross-engine-checked value for value
    "q32b_ann_ivf" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val qvec = e.where(col("vec_id") === 1)
          .select(col("embedding")).collect()(0)
          .getSeq[Float](0)
        val plantedDf = plantedNearDups(s, e, baseId = 1L, prefix = 9100000L)
        val corpus = e.where(col("vec_id") =!= 1)
          .select(col("vec_id"), col("embedding"))
          .unionByName(plantedDf)
        val (assigned, centroids) = Similarity.ivfIndex(corpus, "embedding", "vec_id",
          nlist = 8, trainFraction = 0.25)
        val approx = Similarity.ivfTopK(assigned, centroids, "embedding", "vec_id",
          qvec, k = 10, nprobe = 2).select(col("vec_id"))
        val exactIds = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", qvec, 10)
          .select(col("vec_id"))
        val recall = exactIds.join(approx, Seq("vec_id"), "left_semi").count() / 10.0
        require(recall >= 0.8, s"IVF recall@10 $recall < 0.8 on planted neighbors")
        val q = array(qvec.map(lit): _*)
        corpus.select(col("vec_id"),
            round(Similarity.cosine(col("embedding"), q), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some(plantedTopKSql(baseId = 1, prefix = 9100000))),

    // The IVF CENTROID-DRIFT lifecycle (round-14 verdict carry): the
    // corpus drifts hard — a same-direction cluster the size of the
    // original corpus lands in ONE frozen cell via the incremental
    // refresh — ivfIndexStats reads the skew from manifest metadata
    // and flags the rebuild, rebuildIvfIndexTable retrains + swaps in
    // one commit, skew drops, and a tight-nprobe probe still recalls
    // the planted near-duplicates >= 0.8 off the REBUILT tiling. The
    // hashed rows are the exact top-10 over the index content (the
    // drift cluster is far from the query, so the DuckDB dual can
    // recompute the same top-10 without modeling it).
    "q121_ann_rebuild" -> Q(
      (s, dir) => {
        import graft.table.{GraftCatalog, TableIdent}
        val cat = GraftCatalog(s,
          java.nio.file.Files.createTempDirectory("graft-ann-rebuild").toString)
        val e = t(s, dir, "embeddings")
        val qvec = e.where(col("vec_id") === 1)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        val planted = plantedNearDups(s, e, baseId = 1L, prefix = 9200000L)
        val corpus = cat.ensure(TableIdent("ann", "corpus"))
        corpus.append(e.where(col("vec_id") =!= 1)
          .select(col("vec_id"), col("embedding")).unionByName(planted))
        val idxId = TableIdent("ann", "idx")
        Similarity.buildIvfIndexTable(cat, TableIdent("ann", "corpus"),
          idxId, "embedding", "vec_id", nlist = 8)
        val st0 = Similarity.ivfIndexStats(cat, idxId)
        // drift cluster sized 3× the corpus: copies of vec_id=2's
        // direction, scaled far out with a small per-copy perturbation
        // — the frozen quantizer funnels every copy into one cell. The
        // 3× multiple is the scale-independence fix (r15 verdict): at
        // 1× the skew limit is 8·d/(n+d) → 4.0 exactly (the sf0.001
        // corpus landed at 3.97, a knife-edge miss of the hard 4.0
        // rebuildRecommended threshold); at 3× the limit is 6.0, so
        // the flag clears with ≥1.5× margin at ANY scale factor.
        val n = e.count()
        val drift = e.where(col("vec_id") === 2)
          .select(col("embedding").as("qv"))
          .crossJoin(s.range(1, 3 * n + 1).toDF("i"))
          .select((lit(9400000L) + col("i")).as("vec_id"),
            zip_with(col("qv"), sequence(lit(0), size(col("qv")) - 1),
              (x, d) => (x.cast("double") * lit(25.0) * (lit(1.0) +
                pmod(xxhash64(col("i"), d), lit(7L)).cast("double") / 1000.0))
                .cast("float")).as("embedding"))
        corpus.append(drift)
        val (_, _, action) = Similarity.refreshIvfIndexTable(cat, idxId)
        require(action == "incremental", s"expected incremental refresh, got $action")
        val st1 = Similarity.ivfIndexStats(cat, idxId)
        require(st1.skew > st0.skew && st1.rebuildRecommended,
          s"drift not flagged: skew ${st0.skew} -> ${st1.skew}")
        Similarity.rebuildIvfIndexTable(cat, idxId)
        val st2 = Similarity.ivfIndexStats(cat, idxId)
        require(st2.skew < st1.skew,
          s"rebuild did not rebalance: skew ${st1.skew} -> ${st2.skew}")
        require(st2.versionsBehind == 0, "rebuild must land at the corpus head")
        val idx = cat.load(idxId)
        require(idx.scan().count() == corpus.scan().count(),
          "index/corpus row drift after rebuild")
        val approx = Similarity.ivfTopKFromTable(idx, qvec, k = 10, nprobe = 2)
          .select(col("vec_id"))
        val exactIds = Similarity.bruteForceTopK(corpus.scan(), "embedding", "vec_id",
          qvec, 10).select(col("vec_id"))
        val recall = exactIds.join(approx, Seq("vec_id"), "left_semi").count() / 10.0
        require(recall >= 0.8,
          s"post-rebuild recall@10 $recall < 0.8 at nprobe=2")
        val q = array(qvec.map(lit): _*)
        idx.scan()
          .select(col("vec_id"), round(Similarity.cosine(col("embedding"), q), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
             |planted AS (
             |  SELECT 9200000 + i AS vec_id,
             |    list_transform(range(0, len(qv)),
             |      d -> CAST(qv[d+1] * (1.0 +
             |        (CAST(('0x' || substring(md5(i || '_' || d), 1, 15)) AS UBIGINT) % 5) / 1000.0)
             |        AS FLOAT)) AS embedding
             |  FROM q, range(1, 11) t(i)),
             |corpus AS (
             |  SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 1
             |  UNION ALL SELECT vec_id, embedding FROM planted)
             |SELECT c.vec_id,
             |  ROUND(list_cosine_similarity(
             |    list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
             |    (SELECT list_transform(qv, x -> CAST(x AS DOUBLE)) FROM q)), 4) AS cos
             |FROM corpus c ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // The ANN SERVING shape (round-12/13 verdict carry): the IVF index
    // is built ONCE into a graft table (centroids + source + applied
    // version in table properties, rows partitioned by _cell), then the
    // corpus EVOLVES — appends including fresh near-duplicates of the
    // query, plus a keyed delete slice — and ONE incremental refresh
    // assigns only the changed vectors to the EXISTING centroids (no
    // retraining, asserted by centroid equality) through the corpus
    // changelog and a marker-CAS net-apply. The query then runs off the
    // maintained index with a partition-pruned probe: recall@10 >= 0.8
    // asserted in-plan against brute force over the live corpus, and
    // the hashed rows are the exact top-10 over the INDEX content —
    // drift between index and corpus (a missed delete, a skipped
    // append, a stale assignment) breaks the cross-engine hash.
    "q32p_ann_persisted" -> Q(
      (s, dir) => {
        import graft.table.{GraftCatalog, TableIdent}
        val cat = GraftCatalog(s,
          java.nio.file.Files.createTempDirectory("graft-ann-idx").toString)
        val e = t(s, dir, "embeddings")
        val qvec = e.where(col("vec_id") === 1)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        val planted = plantedNearDups(s, e, baseId = 1L, prefix = 9200000L)
        val corpus = cat.ensure(TableIdent("ann", "corpus"))
        corpus.append(e.where(col("vec_id") =!= 1 && col("vec_id") % 2 === 0)
          .select(col("vec_id"), col("embedding"))
          .unionByName(planted.where(col("vec_id") <= 9200005L)))
        val idx = Similarity.buildIvfIndexTable(cat, TableIdent("ann", "corpus"),
          TableIdent("ann", "idx"), "embedding", "vec_id", nlist = 8)
        val centroidsBefore = idx.currentOrFail().properties(Similarity.CentroidsProp)
        corpus.append(e.where(col("vec_id") =!= 1 && col("vec_id") % 2 === 1)
          .select(col("vec_id"), col("embedding"))
          .unionByName(planted.where(col("vec_id") > 9200005L)))
        corpus.deleteWhere("vec_id % 7 = 3 AND vec_id < 9000000")
        val (_, _, action) = Similarity.refreshIvfIndexTable(cat, TableIdent("ann", "idx"))
        require(action == "incremental", s"expected incremental refresh, got $action")
        val idx2 = cat.load(TableIdent("ann", "idx"))
        require(idx2.currentOrFail().properties(Similarity.CentroidsProp) == centroidsBefore,
          "refresh must not retrain the quantizer")
        require(idx2.scan().count() == corpus.scan().count(),
          "index/corpus row drift after incremental refresh")
        val approx = Similarity.ivfTopKFromTable(idx2, qvec, k = 10, nprobe = 2)
          .select(col("vec_id"))
        val exactIds = Similarity.bruteForceTopK(corpus.scan(), "embedding", "vec_id",
          qvec, 10).select(col("vec_id"))
        val recall = exactIds.join(approx, Seq("vec_id"), "left_semi").count() / 10.0
        require(recall >= 0.8,
          s"persisted-IVF recall@10 $recall < 0.8 after incremental refresh")
        val q = array(qvec.map(lit): _*)
        idx2.scan()
          .select(col("vec_id"), round(Similarity.cosine(col("embedding"), q), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
             |planted AS (
             |  SELECT 9200000 + i AS vec_id,
             |    list_transform(range(0, len(qv)),
             |      d -> CAST(qv[d+1] * (1.0 +
             |        (CAST(('0x' || substring(md5(i || '_' || d), 1, 15)) AS UBIGINT) % 5) / 1000.0)
             |        AS FLOAT)) AS embedding
             |  FROM q, range(1, 11) t(i)),
             |corpus AS (
             |  SELECT vec_id, embedding FROM embeddings
             |  WHERE vec_id <> 1 AND NOT (vec_id % 7 = 3)
             |  UNION ALL SELECT vec_id, embedding FROM planted)
             |SELECT c.vec_id,
             |  ROUND(list_cosine_similarity(
             |    list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
             |    (SELECT list_transform(qv, x -> CAST(x AS DOUBLE)) FROM q)), 4) AS cos
             |FROM corpus c ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ANN recall oracle (round-8 verdict item 5): q32/q32b only prove
    // the approximate paths FIND something — a bucketing bug that
    // tanks recall to 0.1 still passes a rows-only check. The testdata
    // embeddings are near-uniform (top-10 cosine ~0.33, labels
    // uncorrelated), so a raw recall@10 threshold would measure luck,
    // not correctness: even a perfect LSH cannot beat the candidate
    // fraction on structureless data. Instead this plants 10
    // deterministic near-duplicates of the query (cos ~0.9999, built
    // with Spark transforms from the testdata vector itself) — the
    // exact top-10 is provably the planted set, and a CORRECT
    // lshTopK/ivfTopK must recall them at tight pruning settings
    // (near-parallel vectors share hyperplane signs and coarse cells),
    // while a bucket-math, probe-order, or driver/corpus hash mismatch
    // scatters them. Asserted in-plan >= 0.8; the VALUE the oracle
    // hashes is the recall@10 of the portable md5-hyperplane pipeline
    // (q32c's ladder) — both engines derive identical buckets and
    // identical exact/bucket-restricted top-10s, so bucket math is
    // additionally hash-checked cross-engine
    "q32r_ann_recall" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.Column
        val e = t(s, dir, "embeddings")
        val qvec = e.where(col("vec_id") === 0)
          .select(col("embedding")).collect()(0)
          .getSeq[Float](0)
        // 10 planted near-duplicates: element d of copy i scaled by
        // 1 + hash(i,d)%5 / 1000 — deterministic, cosine ~0.9999
        val planted = e.where(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
          .crossJoin(s.range(1, 11).toDF("i"))
          .select((lit(9000000L) + col("i")).as("vec_id"),
            zip_with(col("qv"), sequence(lit(0), size(col("qv")) - 1),
              (x, d) => (x.cast("double") * (lit(1.0) +
                pmod(xxhash64(col("i"), d), lit(5L)).cast("double") / 1000.0))
                .cast("float")).as("embedding"))
        val corpus = e.where(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding"))
          .unionByName(planted)
        val exactIds = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", qvec, 10)
          .select(col("vec_id"))
        val lsh = Similarity.lshTopK(corpus, "embedding", "vec_id", qvec, 10,
          planes = 6, multiprobe = 2, tables = 2).select(col("vec_id"))
        val lshRecall = exactIds.join(lsh, Seq("vec_id"), "left_semi").count() / 10.0
        require(lshRecall >= 0.8, s"LSH recall@10 $lshRecall < 0.8")
        val (assigned, centroids) = Similarity.ivfIndex(corpus, "embedding", "vec_id",
          nlist = 8, trainFraction = 0.25)
        val ivf = Similarity.ivfTopK(assigned, centroids, "embedding", "vec_id",
          qvec, k = 10, nprobe = 2).select(col("vec_id"))
        val ivfRecall = exactIds.join(ivf, Seq("vec_id"), "left_semi").count() / 10.0
        require(ivfRecall >= 0.8, s"IVF recall@10 $ivfRecall < 0.8")
        // the hash-checked value: portable-hyperplane recall@10
        val planes = 4
        val e300 = e.where(col("vec_id") < 300)
          .select(col("vec_id"), col("embedding").as("v"))
        def planeComp(p: Int, d: Column): Column =
          (conv(substring(md5(concat(lit(s"${p}_"), d.cast("string"))), 1, 15), 16, 10)
            .cast("long") % 1000).cast("double") / 1000.0 - 0.5
        def dotPlane(p: Int): Column = aggregate(
          zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
            (x, d) => x.cast("double") * planeComp(p, d)),
          lit(0.0), (acc, x) => acc + x)
        val bucketed = e300.withColumn("bucket",
          (0 until planes).map(p =>
            when(dotPlane(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
            .reduce(_ + _))
        val qrow = bucketed.where(col("vec_id") === 7)
          .select(col("v").as("qv"), col("bucket").as("qb"))
        def cosTo(v: Column, qv: Column): Column = round(
          aggregate(zip_with(v, qv, (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (a, x) => a + x) /
          (sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, x) => a + x)) *
           sqrt(aggregate(transform(qv, x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, x) => a + x))), 4)
        val scored = bucketed.where(col("vec_id") =!= 7)
          .crossJoin(broadcast(qrow))
          .select(col("vec_id"), col("bucket"), col("qb"),
            cosTo(col("v"), col("qv")).as("cos"))
        val exactTop = scored
          .orderBy(col("cos").desc, col("vec_id")).limit(10).select(col("vec_id"))
        val approxTop = scored.where(col("bucket") === col("qb"))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
          .select(col("vec_id"), col("cos"))
        // the hashed rows: the bucket-restricted top-10 itself, flagged
        // by exact-top membership — richer than a recall count (a count
        // of 0 is reachable by many bugs; these exact rows are not)
        approxTop
          .join(exactTop.withColumn("in_exact", lit(true)), Seq("vec_id"), "left")
          .select(col("vec_id"), col("cos"),
            coalesce(col("in_exact"), lit(false)).as("in_exact"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < 300),
             |b AS (
             |  SELECT vec_id, v,
             |    (CASE WHEN list_sum(list_transform(range(0, len(v)),
             |       d -> v[d+1] * (CAST(('0x' || substring(md5('0_' || d), 1, 15)) AS UBIGINT) % 1000 / 1000.0 - 0.5))) >= 0 THEN 1 ELSE 0 END)
             |  + 2 * (CASE WHEN list_sum(list_transform(range(0, len(v)),
             |       d -> v[d+1] * (CAST(('0x' || substring(md5('1_' || d), 1, 15)) AS UBIGINT) % 1000 / 1000.0 - 0.5))) >= 0 THEN 1 ELSE 0 END)
             |  + 4 * (CASE WHEN list_sum(list_transform(range(0, len(v)),
             |       d -> v[d+1] * (CAST(('0x' || substring(md5('2_' || d), 1, 15)) AS UBIGINT) % 1000 / 1000.0 - 0.5))) >= 0 THEN 1 ELSE 0 END)
             |  + 8 * (CASE WHEN list_sum(list_transform(range(0, len(v)),
             |       d -> v[d+1] * (CAST(('0x' || substring(md5('3_' || d), 1, 15)) AS UBIGINT) % 1000 / 1000.0 - 0.5))) >= 0 THEN 1 ELSE 0 END)
             |    AS bucket
             |  FROM e),
             |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 7),
             |scored AS (
             |  SELECT b.vec_id, b.bucket, q.qb,
             |    ROUND(
             |      list_sum(list_transform(range(0, len(b.v)), d -> b.v[d+1] * q.qv[d+1]))
             |      / (sqrt(list_sum(list_transform(b.v, x -> x * x)))
             |         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS cos
             |  FROM b, q WHERE b.vec_id <> 7),
             |exact AS (SELECT vec_id FROM scored ORDER BY cos DESC, vec_id LIMIT 10),
             |approx AS (SELECT vec_id, cos FROM scored WHERE bucket = qb
             |           ORDER BY cos DESC, vec_id LIMIT 10)
             |SELECT a.vec_id, a.cos, (e.vec_id IS NOT NULL) AS in_exact
             |FROM approx a LEFT JOIN exact e USING (vec_id)""".stripMargin)),

    // embedding statistics per label (exact per-element double math)
    "q33_embed_stats" -> Q(
      (s, dir) => t(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(avg(round(Similarity.norm(col("embedding")), 6)), 4).as("avg_norm"))
        .orderBy(col("label")),
      Some("""SELECT label, COUNT(*) AS n,
             |  ROUND(AVG(ROUND(sqrt(list_sum(list_transform(embedding,
             |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)), 4) AS avg_norm
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)),

    // ---- multimodal ---------------------------------------------------

    // metadata-only path: payload column never read (column pruning)
    "q34_multimodal_meta" -> Q(
      (s, dir) => {
        val assets = Multimodal.syntheticAssets(
          t(s, dir, "documents"), "doc_id", "text")
        Multimodal.metadataOnly(assets)
          .groupBy(col("modality"))
          .agg(count(lit(1)).as("n"), sum(col("payload_bytes").cast("long")).as("bytes"))
          .orderBy(col("modality"))
      },
      Some("""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
             |            WHEN doc_id % 3 = 1 THEN 'audio'
             |            ELSE 'video' END AS modality,
             |  COUNT(*) AS n, CAST(SUM(strlen(text)) AS BIGINT) AS bytes
             |FROM documents GROUP BY 1 ORDER BY modality""".stripMargin)),

    // frame-sampling plumbing: per-partition fan-out (1 video row -> K
    // frame rows) with the deterministic fake of 1 frame per 100 payload
    // bytes — the sampled-frame count IS SQL-expressible, so the oracle
    // pins the fan-out arithmetic exactly
    "q37_frame_sampling" -> Q(
      (s, dir) => {
        val assets = Multimodal.syntheticAssets(
          t(s, dir, "documents").where(col("doc_id") < 100), "doc_id", "text")
        Multimodal.sampleFrames(assets, everyN = 3)
          .groupBy(col("asset_id"))
          .agg(count(lit(1)).as("sampled_frames"), max(col("frame_index")).as("last_frame"))
          .orderBy(col("asset_id"))
      },
      Some("""SELECT doc_id AS asset_id,
             |  CAST(((strlen(text) // 100 + 1) + 2) // 3 AS BIGINT) AS sampled_frames,
             |  CAST(((strlen(text) // 100 + 1) - 1) // 3 * 3 AS INT) AS last_frame
             |FROM documents WHERE doc_id < 100 ORDER BY asset_id""".stripMargin)),

    // feature-extraction plumbing: per-partition decode stub, real
    // schema/batching; byte-histogram feature is deterministic but not
    // SQL-expressible — internal-consistency checks + rows-only
    "q35_multimodal_features" -> Q(
      (s, dir) => {
        val assets = Multimodal.syntheticAssets(
          t(s, dir, "documents").where(col("doc_id") < 100), "doc_id", "text")
        val feats = Multimodal.extractFeatures(assets, dims = 8)
        feats.select(col("asset_id"), col("modality"), col("payload_bytes"),
            round(aggregate(col("feature"), lit(0.0d), (a, x) => a + x), 3).as("feature_l1"))
          .orderBy(col("asset_id"))
      },
      // the stubbed decode emits an L1-normalized byte histogram, so the
      // L1 mass is exactly 1 for any nonempty payload — the oracle pins
      // the metadata passthrough, the synthetic-payload byte length, and
      // the normalization contract
      Some("""SELECT doc_id AS asset_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS modality,
             |  CAST(strlen(text) AS BIGINT) AS payload_bytes,
             |  CAST(CASE WHEN strlen(text) = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE) AS feature_l1
             |FROM documents WHERE doc_id < 100 ORDER BY asset_id""".stripMargin)))
}
