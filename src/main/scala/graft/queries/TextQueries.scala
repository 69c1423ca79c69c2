package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

/** LLM-training-data text operators over the `documents` table: statistics,
  * token counting, language ID, quality scoring, fingerprinting, and the
  * dedup family (exact, MinHash/LSH, SimHash, n-gram Jaccard).
  *
  * Reference shapes: the text-processing table functions tier
  * (flink-table-planner/…/exec/stream/StreamExecMLPredictTableFunction.java:55
  * is the "table function over documents" pattern); dedup semantics follow
  * standard MinHash/LSH (Broder) and SimHash (Charikar) as used by every
  * large-scale corpus pipeline.
  *
  * Scale design (100 TB): every query below is shuffle-bounded by
  * (doc, shingle/token) exploded rows — linear in corpus size. Candidate
  * generation is ALWAYS by equality join on a bucket key (LSH band, exact
  * hash, shared shingle) — never an all-pairs product. The only self-joins
  * are on those bucket keys, which AQE handles like any equi-join (skewed
  * hot shingles get the standard cap treatment, see q_ngram_jaccard note).
  */
object TextQueries {
  // Every documents load goes through Tables.spread (r19): the corpus is
  // one sub-split parquet file, so all per-row text work (shingling,
  // per-gram md5, regex packs) otherwise ran in a ONE-task scan stage;
  // spread is a size-gated no-op at scale (see its scaladoc).

  // Shared oracle fragment: tokenized documents. list_filter drops the
  // empty tokens that split() produces for trailing/double spaces —
  // mirrors TextAnalysis.tokens.
  private val dOracle =
    "d AS (SELECT doc_id, lang, source, n_chars, text, " +
      "list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents)"

  // Shared oracle fragment: distinct (doc_id, 3-word shingle) pairs.
  private val shOracle =
    s"""WITH $dOracle,
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
       |    THEN list_transform(range(1, len(t) - 1),
       |                        i -> array_to_string(t[i:i+2], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM d))""".stripMargin

  /** MinHash/LSH candidate generation with a hot-bucket cap (VERDICT r14
    * #2 — same treatment as the embedding-LSH path, VectorQueries
    * cosineDupPairs, and NgramJaccard.cappedPostings).
    *
    * Signature: 16 components = MIN(md5("seed:" + 3-shingle)) computed as
    * COLUMNS of one groupBy (a seed explode would multiply the shuffle
    * 16×); 4 bands × 4 rows; candidates = docs sharing any band key.
    *
    * The in-bucket `collect_list` + pair explosion is quadratic in bucket
    * size, and a boilerplate/template-heavy corpus at 100 TB puts millions
    * of near-identical docs into ONE band bucket (they are hot in EVERY
    * band at once, so no other band rescues them) — one task OOMs.
    * Buckets at or under `bucketCap` emit ALL pairs; buckets over it
    * switch to REPRESENTATIVE pairing (each member pairs with the
    * bucket's min-id rep — linear, never quadratic; the rep star keeps
    * full-dup clusters connected for any downstream connected-components
    * pass; member–member recall in over-cap buckets is partial by design).
    * The per-bucket count and rep come from ONE WINDOW over (band, bkey):
    * its exchange is the same partitioning the grouping needs, so
    * Catalyst plans one shuffle, and the size gate runs BEFORE
    * collect_list materializes any array. Cap 64 ≫ observed maxima
    * (max bucket 3 at sf0.01, 6 at sf0.1), so oracle results are exactly
    * the uncapped answer; configure per corpus at scale.
    */
  private[graft] def minhashCandidatePairs(
      docs: org.apache.spark.sql.DataFrame,
      bucketCap: Int = 64): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Tokens projected before the explode — inlining tokens(text) into
    // the Generate re-evaluates split+filter per lambda element
    // (see NgramJaccard scaladoc; ~4x on this subtree).
    val sh = docs
      .select(col("doc_id"), tokens(col("text")).as("__t"))
      .select(col("doc_id"),
        explode(shingles(col("__t"), 3)).as("s"))
    val mhs = (0 until 16).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")))).as(s"mh$i"))
    val sig16 = sh.groupBy(col("doc_id")).agg(mhs.head, mhs.tail: _*)
    val bandExprs = (0 until 4).map { b =>
      md5(concat_ws(",",
        (0 until 4).map(i => col(s"mh${b * 4 + i}")): _*)).as(s"bk$b")
    }
    val bands = sig16
      .select(col("doc_id") +: bandExprs: _*)
      .selectExpr("doc_id",
        "stack(4, 0, bk0, 1, bk1, 2, bk2, 3, bk3) AS (band, bkey)")
    val bucketW = Window.partitionBy(col("band"), col("bkey"))
    val withStats = bands
      .withColumn("__n", count(lit(1)).over(bucketW))
      .withColumn("__rep", min(col("doc_id")).over(bucketW))
    // in-bucket pair explosion evaluates the signature pipeline ONCE (a
    // band self-join would compute it per side; TextAnalysis.sortedPairs)
    val fullPairs = withStats
      .where(col("__n") <= bucketCap)
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) > 1)
      .select(explode(sortedPairs(col("ds"))).as("p"))
      .select(col("p").getItem(0).as("doc_a"),
        col("p").getItem(1).as("doc_b"))
    val repPairs = withStats
      .where(col("__n") > bucketCap && col("doc_id") =!= col("__rep"))
      .select(col("__rep").as("doc_a"), col("doc_id").as("doc_b"))
    fullPairs.union(repPairs).distinct()
  }

  val defs: Seq[QueryDef] = Seq(

    // Per-document statistics: token counts, distinct tokens, type-token
    // ratio, average token length. Counts are exact integers; ratios are
    // computed as double divisions of those integers at the last step.
    QueryDef(
      "q_text_stats",
      (s, dir) => {
        val t = tokens(col("text"))
        Tables.spread(Tables.documents(s, dir))
          .select(
            col("doc_id"), col("lang"), col("source"),
            t.as("t"), col("text"))
          .select(
            col("doc_id"), col("lang"), col("source"),
            size(col("t")).cast("long").as("n_tokens"),
            size(array_distinct(col("t"))).cast("long").as("n_distinct"),
            length(col("text")).cast("long").as("n_chars_actual"),
            aggregate(transform(col("t"), x => length(x)), lit(0L),
              (acc, x) => acc + x).as("sum_tok_len"))
          .withColumn("ttr",
            col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .withColumn("avg_tok_len",
            col("sum_tok_len").cast("double") / col("n_tokens").cast("double"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $dOracle
        SELECT doc_id, lang, source,
          CAST(len(t) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
          CAST(length(text) AS BIGINT) AS n_chars_actual,
          CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS sum_tok_len,
          CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS ttr,
          CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
            / CAST(len(t) AS DOUBLE) AS avg_tok_len
        FROM d ORDER BY doc_id
      """.stripMargin.trim)),

    // Corpus-level token accounting per source: whitespace tokens and a
    // regex token class count (the BPE-ish pre-tokenizer shape: runs of
    // letters) — the "how many tokens is this corpus" pipeline question.
    QueryDef(
      "q_token_count",
      (s, dir) => {
        val t = tokens(col("text"))
        Tables.spread(Tables.documents(s, dir))
          .select(col("source"),
            size(t).cast("long").as("ws_toks"),
            regexp_count(col("text"), lit("[a-z]+")).cast("long").as("re_toks"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ws_toks")).as("sum_ws_tokens"),
            sum(col("re_toks")).as("sum_re_tokens"),
            max(col("ws_toks")).as("max_doc_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH $dOracle
        SELECT source,
          COUNT(*) AS n_docs,
          CAST(SUM(len(t)) AS BIGINT) AS sum_ws_tokens,
          CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS sum_re_tokens,
          CAST(MAX(len(t)) AS BIGINT) AS max_doc_tokens
        FROM d GROUP BY source ORDER BY source
      """.stripMargin.trim)),

    // Token-bounded document chunking with overlap (round 12): the
    // context-window splitting step every training pipeline runs before
    // tokenization — 64-token chunks, stride 48 (16 tokens of overlap).
    // Expression-only (sequence/transform/slice/array_join + posexplode);
    // the oracle re-derives every chunk string relationally.
    QueryDef(
      "q_chunk_documents",
      (s, dir) => {
        val docs = Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"),
            chunkTokens(tokens(col("text")), maxTokens = 64, stride = 48)
              .as("chunks"))
        docs.select(col("doc_id"), posexplode(col("chunks")))
          .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
            size(tokens(col("col"))).cast("long").as("chunk_toks"),
            col("col").as("chunk_text"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(s"""
        WITH $dOracle,
        c AS (SELECT doc_id,
          list_transform(
            range(0, CASE WHEN len(t) <= 64 THEN 1
                     ELSE 1 + CAST(CEIL((len(t) - 64) / 48.0) AS INT) END),
            i -> array_to_string(t[i*48+1 : i*48+64], ' ')) AS chunks
          FROM d),
        e AS (SELECT doc_id,
          unnest(list_transform(range(0, len(chunks)),
            i -> {'cid': i, 'chunk': chunks[i+1]})) AS u
          FROM c)
        SELECT doc_id, CAST(u.cid AS BIGINT) AS chunk_id,
          CAST(len(list_filter(string_split(u.chunk, ' '), x -> x <> ''))
            AS BIGINT) AS chunk_toks,
          u.chunk AS chunk_text
        FROM e ORDER BY doc_id, chunk_id
      """.stripMargin.trim)),

    // Language ID, n-gram-profile style: build a top-2 most-frequent-token
    // profile per labeled language, then classify every document by profile
    // hit count (argmax, ties broken lexicographically). The profile build +
    // score + argmax is the exact relational shape of classic n-gram lang-id
    // (Cavnar-Trenkle), collapsed to unigrams for the synthetic corpus.
    QueryDef(
      "q_lang_id",
      (s, dir) => {
        val docs = Tables.spread(Tables.documents(s, dir))
        val docTok = docs
          .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
        val profiles = docTok
          .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
          .withColumn("rk",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("lang"))
              .orderBy(col("cnt").desc, col("tok").asc)))
          .where(col("rk") <= 2)
          .select(col("lang").as("plang"), col("tok"))
        val hits = docTok.select(col("doc_id"), col("tok")).distinct()
          .join(profiles, "tok")
          .groupBy(col("doc_id"), col("plang"))
          .agg(count(lit(1)).as("hits"))
        hits
          .withColumn("rk",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id"))
              .orderBy(col("hits").desc, col("plang").asc)))
          .where(col("rk") === 1)
          .select(col("doc_id"), col("plang").as("pred_lang"), col("hits"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $dOracle,
        doctok AS (SELECT doc_id, lang, unnest(t) AS tok FROM d),
        profiles AS (
          SELECT lang AS plang, tok FROM (
            SELECT lang, tok, COUNT(*) AS cnt,
              row_number() OVER (PARTITION BY lang
                                 ORDER BY COUNT(*) DESC, tok ASC) AS rk
            FROM doctok GROUP BY lang, tok) WHERE rk <= 2),
        hits AS (
          SELECT dt.doc_id, p.plang, COUNT(*) AS hits
          FROM (SELECT DISTINCT doc_id, tok FROM doctok) dt
          JOIN profiles p ON dt.tok = p.tok
          GROUP BY dt.doc_id, p.plang)
        SELECT doc_id, plang AS pred_lang, hits FROM (
          SELECT doc_id, plang, hits,
            row_number() OVER (PARTITION BY doc_id
                               ORDER BY hits DESC, plang ASC) AS rk
          FROM hits) WHERE rk = 1 ORDER BY doc_id
      """.stripMargin.trim)),

    // Heuristic quality score: length saturation, type-token ratio,
    // stopword coverage, average-word-length saturation, equally weighted.
    // All components are integer counts divided as doubles — bit-exact
    // across engines.
    QueryDef(
      "q_quality_score",
      (s, dir) => {
        val stops = Seq("the", "a", "data", "table", "row")
        val t = tokens(col("text"))
        Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"), t.as("t"))
          .select(
            col("doc_id"),
            size(col("t")).cast("long").as("n_tokens"),
            size(array_distinct(col("t"))).cast("long").as("n_distinct"),
            size(filter(col("t"), x => x.isInCollection(stops))).cast("long")
              .as("n_stop"),
            aggregate(transform(col("t"), x => length(x)), lit(0L),
              (acc, x) => acc + x).as("sum_tok_len"))
          .select(
            col("doc_id"), col("n_tokens"),
            (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
              .as("ttr"),
            (col("n_stop").cast("double") / col("n_tokens").cast("double"))
              .as("stop_ratio"),
            (col("sum_tok_len").cast("double") / col("n_tokens").cast("double"))
              .as("avg_tok_len"))
          .withColumn("score",
            (least(lit(1.0), col("n_tokens").cast("double") / lit(200.0))
              + col("ttr") + col("stop_ratio")
              + least(lit(1.0), col("avg_tok_len") / lit(8.0))) / lit(4.0))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $dOracle,
        m AS (SELECT doc_id,
          CAST(len(t) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
          CAST(len(list_filter(t, x -> x IN ('the','a','data','table','row')))
            AS BIGINT) AS n_stop,
          CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
            AS sum_tok_len
        FROM d),
        r AS (SELECT doc_id, n_tokens,
          CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
          CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
          CAST(sum_tok_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_tok_len
        FROM m)
        SELECT doc_id, n_tokens, ttr, stop_ratio, avg_tok_len,
          (least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(200.0 AS DOUBLE))
            + ttr + stop_ratio
            + least(CAST(1.0 AS DOUBLE), avg_tok_len / CAST(8.0 AS DOUBLE)))
            / CAST(4.0 AS DOUBLE) AS score
        FROM r ORDER BY doc_id
      """.stripMargin.trim)),

    // Document fingerprinting: md5 of every char 8-gram, keep the
    // content-deterministic 1-in-4 subset (first hex digit ≡ 0 mod 4) —
    // winnowing-style density reduction for copy detection.
    QueryDef(
      "q_doc_fingerprint",
      (s, dir) => {
        // explode + TOP-LEVEL md5 instead of charGramFingerprints' array
        // lambda: higher-order-function lambdas run interpreted, so the
        // per-gram md5 was ~3µs; as a Generate + codegen'd projection the
        // same work whole-stage-compiles (~3x faster end to end). The
        // distinct/min/max fold is a map-side-partial groupBy on doc_id.
        val docs = Tables.spread(Tables.documents(s, dir))
        val kept = docs
          .where(length(col("text")) >= 8)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), length(col("text")) - lit(7))).as("i"))
          .select(col("doc_id"),
            md5(call_function("substring", col("text"), col("i"), lit(8)))
              .as("h"))
          .where(hexDigit(col("h"), lit(1)) % 4 === 0)
          .groupBy(col("doc_id"))
          .agg(
            countDistinct(col("h")).as("n_fingerprints"),
            min(col("h")).as("min_fp"),
            max(col("h")).as("max_fp"))
        docs.select(col("doc_id"))
          .join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_fingerprints"), lit(0L)).as("n_fingerprints"),
            col("min_fp"), col("max_fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id, list_distinct(list_filter(
            CASE WHEN length(text) >= 8
              THEN list_transform(range(1, length(text) - 6),
                                  i -> md5(substr(text, i, 8)))
              ELSE CAST([] AS VARCHAR[]) END,
            h -> (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 4 = 0))
            AS fp
          FROM documents)
        SELECT doc_id,
          CAST(len(fp) AS BIGINT) AS n_fingerprints,
          list_min(fp) AS min_fp,
          list_max(fp) AS max_fp
        FROM g ORDER BY doc_id
      """.stripMargin.trim)),

    // Exact dedup: hash-groupBy on a canonical key (md5 of the first 10
    // tokens), emit duplicate groups with their members. The 100 TB shape:
    // one shuffle on the 16-byte key, map-side partial counts.
    QueryDef(
      "q_dedup_exact",
      // deliberately NOT spread (r19): this is a box-factor CONTROL query
      // (Bench controlNames) — its recorded baseline calibrates box health,
      // so its implementation must stay byte-stable across rounds
      (s, dir) => {
        val key = md5(concat_ws(" ", slice(tokens(col("text")), 1, 10)))
        Tables.documents(s, dir)
          .select(key.as("key"), col("doc_id"))
          .groupBy(col("key"))
          .agg(
            count(lit(1)).as("cnt"),
            min(col("doc_id")).as("keep_doc"),
            concat_ws(",",
              transform(array_sort(collect_list(col("doc_id"))),
                x => x.cast("string"))).as("doc_ids"))
          .where(col("cnt") > 1)
          .orderBy(col("key"))
      },
      Some(s"""
        WITH $dOracle
        SELECT md5(array_to_string(t[1:10], ' ')) AS key,
          COUNT(*) AS cnt,
          MIN(doc_id) AS keep_doc,
          string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
        FROM d GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY key
      """.stripMargin.trim)),

    // MinHash + LSH near-dup candidates. 16 signature components =
    // MIN(md5("<seed>:" + shingle)) per seed; 4 bands × 4 rows; candidate
    // pairs = docs sharing any band key. The join is ONLY within band
    // buckets — never all-pairs (VERDICT r1 requirement). Scale: explode
    // is 16× distinct shingles; signature/band aggs are map-side partial;
    // the candidate join keys are 16-byte md5s with tiny groups, and
    // degenerate (boilerplate-heavy) band buckets are capped — see
    // [[minhashCandidatePairs]].
    QueryDef(
      "q_dedup_minhash",
      (s, dir) => minhashCandidatePairs(Tables.spread(Tables.documents(s, dir)))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        $shOracle,
        seeded AS (
          SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || s) AS h
          FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) seeds),
        sig AS (SELECT doc_id, seed, MIN(h) AS mh
                FROM seeded GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 4 AS band,
                         md5(string_agg(mh, ',' ORDER BY seed)) AS bkey
                  FROM sig GROUP BY doc_id, seed // 4)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ORDER BY doc_a, doc_b
      """.stripMargin.trim)),

    // SimHash: 16-bit signature over the distinct-token set; each bit is
    // the sign of the summed ±1 votes from md5(token) bit b. Near-dups
    // land on equal/close signatures. Pure integer arithmetic end-to-end.
    QueryDef(
      "q_dedup_simhash",
      (s, dir) => {
        val votes = Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
          .select(col("doc_id"), md5(col("tok")).as("h"),
            explode(sequence(lit(0), lit(15))).as("b"))
          .select(col("doc_id"), col("b"),
            (hexBit(col("h"), col("b")) * lit(2) - lit(1)).as("vote"))
        votes
          .groupBy(col("doc_id"), col("b"))
          .agg(sum(col("vote")).as("v"))
          .select(col("doc_id"),
            (when(col("v") > 0, 1).otherwise(0) *
              call_function("shiftleft", lit(1), col("b"))).as("bitval"))
          .groupBy(col("doc_id"))
          .agg(sum(col("bitval")).as("simhash"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $dOracle,
        toks AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM d),
        votes AS (
          SELECT doc_id, b,
            CASE WHEN ((strpos('0123456789abcdef',
                               substr(md5(tok), 1 + b // 4, 1)) - 1)
                       >> (3 - b % 4)) & 1 = 1
                 THEN 1 ELSE -1 END AS vote
          FROM toks CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bits),
        sums AS (SELECT doc_id, b, SUM(vote) AS v
                 FROM votes GROUP BY doc_id, b)
        SELECT doc_id,
          CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END * (1 << b)) AS BIGINT)
            AS simhash
        FROM sums GROUP BY doc_id ORDER BY doc_id
      """.stripMargin.trim)),

    // Exact n-gram Jaccard over candidate pairs generated by the inverted
    // shingle index (equality join on shingle — the only join key), with
    // the hot-shingle document-frequency cap that keeps the self-join
    // linear at 100 TB (see NgramJaccard scaladoc). The cap (10) exceeds
    // the sf0.01 max shingle df (7), so the uncapped oracle matches
    // byte-exactly at verification scale.
    QueryDef(
      "q_ngram_jaccard",
      (s, dir) =>
        graft.operators.NgramJaccard(Tables.spread(Tables.documents(s, dir)))
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        $shOracle,
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, inter, na + nb - inter AS uni,
          CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
        FROM inter
        JOIN (SELECT doc_id AS doc_a, n AS na FROM sizes) USING (doc_a)
        JOIN (SELECT doc_id AS doc_b, n AS nb FROM sizes) USING (doc_b)
        WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.5
        ORDER BY doc_a, doc_b
      """.stripMargin.trim)),

    // Duplicate CLUSTERING: the end of the near-dup pipeline — Jaccard
    // candidate pairs → connected components → keep the minimum doc_id
    // per cluster. The oracle recomputes components with a recursive CTE
    // (transitive closure, min reachable id).
    QueryDef(
      "q_dedup_cluster",
      (s, dir) => {
        val pairs = graft.operators.NgramJaccard(Tables.spread(Tables.documents(s, dir)))
          .select(col("doc_a"), col("doc_b"))
        graft.operators.ConnectedComponents(pairs, "doc_a", "doc_b")
          .select(col("node").as("doc_id"), col("label").as("cluster"),
            (col("node") === col("label")).as("is_kept"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        $shOracle,
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        e AS (
          SELECT doc_a, doc_b FROM inter
          JOIN (SELECT doc_id AS doc_a, n AS na FROM sizes) USING (doc_a)
          JOIN (SELECT doc_id AS doc_b, n AS nb FROM sizes) USING (doc_b)
          WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)
                >= 0.5),
        sym AS (SELECT doc_a AS a, doc_b AS b FROM e
                UNION SELECT doc_b, doc_a FROM e),
        reach AS (
          SELECT DISTINCT a AS node, a AS r FROM sym
          UNION
          SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node)
        SELECT node AS doc_id, MIN(r) AS cluster,
               node = MIN(r) AS is_kept
        FROM reach GROUP BY node ORDER BY doc_id
      """.stripMargin.trim.replaceFirst("WITH ", "WITH RECURSIVE "))),

    // PII redaction — the scrubbing pass every training-data pipeline runs
    // before a corpus ships. Deterministic PII (an email + a phone per
    // doc) is synthesized in-query so the regexes exercise real matches;
    // both engines build the identical string, then count and redact.
    QueryDef(
      "q_pii_redact",
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
        Tables.spread(Tables.documents(s, dir))
          .withColumn("pii_text", concat(
            col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .select(
            col("doc_id"),
            regexp_count(col("pii_text"), lit(emailRe)).as("n_emails"),
            regexp_count(col("pii_text"), lit(phoneRe)).as("n_phones"),
            regexp_replace(
              regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>").as("redacted"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id,
            text || ' contact user' || doc_id || '@example.com or 555-' ||
            lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii_text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(pii_text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
            AS n_emails,
          CAST(len(regexp_extract_all(pii_text,
            '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
          regexp_replace(regexp_replace(pii_text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
        FROM p ORDER BY doc_id
      """.stripMargin.trim)),

    // Repetition-based quality filter (the Gopher-style duplicate-token
    // gate): documents whose duplicate-word fraction exceeds the threshold
    // are flagged for removal before training.
    QueryDef(
      "q_repetition_filter",
      (s, dir) => {
        val t = split(col("text"), " +")
        Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"), size(t).cast("long").as("n_words"),
            size(array_distinct(t)).cast("long").as("n_distinct"))
          .withColumn("dup_ratio",
            (col("n_words") - col("n_distinct")).cast("double") /
              col("n_words").cast("double"))
          .withColumn("keep", col("dup_ratio") <= 0.55)
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id,
            CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_words,
            CAST(len(list_distinct(string_split_regex(text, ' +')))
              AS BIGINT) AS n_distinct
          FROM documents)
        SELECT doc_id, n_words, n_distinct,
          CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE)
            AS dup_ratio,
          (CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE))
            <= 0.55 AS keep
        FROM w ORDER BY doc_id
      """.stripMargin.trim)),

    // Benchmark decontamination: corpus docs sharing >= 20% of their
    // distinct 3-gram shingles with a benchmark doc (every 10th doc plays
    // the benchmark; 7 contaminated pairs at sf0.01, so the oracle checks
    // real positives). The benchmark shingle set is BROADCAST — the
    // corpus never shuffles for the probe (asserted in PlanSpec).
    QueryDef(
      "q_decontaminate",
      (s, dir) => {
        val docs = Tables.spread(Tables.documents(s, dir))
        Decontaminate(
          docs.where(col("doc_id") % 10 =!= 0),
          docs.where(col("doc_id") % 10 === 0)
            .select(col("doc_id").as("bench_id"), col("text")),
          minOverlap = 0.2)
          .orderBy(col("doc_id"), col("bench_id"))
      },
      Some(s"""
        $shOracle,
        c AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
        b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 10 = 0),
        tot AS (SELECT doc_id, COUNT(*) AS total FROM c GROUP BY doc_id),
        m AS (SELECT c.doc_id, b.bench_id, COUNT(*) AS matched
              FROM c JOIN b USING (s) GROUP BY 1, 2)
        SELECT m.doc_id, m.bench_id, m.matched, t.total,
               CAST(m.matched AS DOUBLE) / CAST(t.total AS DOUBLE) AS overlap
        FROM m JOIN tot t ON t.doc_id = m.doc_id
        WHERE CAST(m.matched AS DOUBLE) / CAST(t.total AS DOUBLE) >= 0.2
        ORDER BY m.doc_id, m.bench_id
      """.stripMargin.trim)),

    // URL-level dedup (graft.functions.UrlFunctions): the FIRST dedup
    // pass of a web-scale pipeline — canonicalize away protocol-case /
    // default-port / fragment / utm-tracking / trailing-slash variants
    // (pure codegen'd regexp expressions, no shuffle), then one
    // hash-groupBy on the canonical URL keeping the smallest doc id.
    // The fixture synthesizes the four variant families deterministically
    // from (source, doc_id); the oracle replays the same canonical rules
    // in DuckDB's RE2 dialect.
    QueryDef(
      "q_url_dedup",
      (s, dir) => {
        import graft.functions.UrlFunctions
        val base = concat(col("source"), lit(".example.com/docs/"),
          (col("doc_id") % 50).cast("string"))
        val url = when(col("doc_id") % 4 === 0,
            concat(lit("https://"), base))
          .when(col("doc_id") % 4 === 1,
            concat(lit("HTTPS://"), upper(col("source")),
              lit(".EXAMPLE.COM:443/docs/"),
              (col("doc_id") % 50).cast("string"), lit("/")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("https://"), base,
              lit("?utm_source=feed&utm_medium=rss")))
          .otherwise(concat(lit("https://"), base, lit("#section-2")))
        Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            UrlFunctions.canonicalizeUrl(col("url")).as("canonical"))
          .groupBy(col("canonical"))
          .agg(min(col("doc_id")).as("rep_doc"),
            count(lit(1)).as("n_variants"))
          .orderBy(col("canonical"))
      },
      Some {
        import graft.functions.UrlFunctions.sqlCanonicalizeUrl
        val base = "source || '.example.com/docs/' || " +
          "CAST(doc_id % 50 AS VARCHAR)"
        val url =
          s"""CASE doc_id % 4
             WHEN 0 THEN 'https://' || $base
             WHEN 1 THEN 'HTTPS://' || UPPER(source) ||
               '.EXAMPLE.COM:443/docs/' || CAST(doc_id % 50 AS VARCHAR) || '/'
             WHEN 2 THEN 'https://' || $base || '?utm_source=feed&utm_medium=rss'
             ELSE 'https://' || $base || '#section-2' END"""
        s"""WITH u AS (SELECT doc_id, $url AS url FROM documents)
           SELECT ${sqlCanonicalizeUrl("url")} AS canonical,
                  MIN(doc_id) AS rep_doc, COUNT(*) AS n_variants
           FROM u
           GROUP BY 1 ORDER BY canonical""".stripMargin.trim
      })
  )
}
