package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.ops.{Dedup, Multimodal, Sampling, Similarity, Skew, TemporalJoin, TextAnalysis}

/** LLM-data-pipeline extensions (north star): deduplication, similarity
  * search, text analysis, multimodal plumbing — over the `documents` and
  * `embeddings` tables. Every query carries a DuckDB oracle. The
  * hash-approximate operators (minhash/simhash/LSH) are gated via
  * candidates-then-verify: the approximate stage only *proposes* pairs, an
  * exact rescore (full-token Jaccard / true cosine) decides, so the final
  * output equals the exact ground truth whenever recall is total — making
  * oracle equality a real recall test, with property tests in ScalaTest as
  * the second line.
  */
object ExtensionQueries {

  val qs: Map[String, Q] = Map(

    // ---- exact dedup: one hash-groupBy, the 100 TB-safe baseline ----
    "x1_dedup_exact" -> Q(
      (s, dir) => Dedup.exact(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("fingerprint")),
      Some("SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY 1 ORDER BY 1")),

    // ---- exact n-gram (word-set) Jaccard near-dup pairs via inverted index ----
    "x2_dedup_jaccard" -> Q(
      (s, dir) => Dedup.jaccardPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id", "text", 0.8)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (
          SELECT doc_id AS id, unnest(list_distinct(
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS tok
          FROM documents WHERE doc_id < 200),
        sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY 1),
        inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2)
        SELECT id_a, id_b, inter,
               cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
        FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
        WHERE cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8
        ORDER BY id_a, id_b""")),

    // ---- character 3-gram shingle Jaccard (robust to word-boundary edits) ----
    "x11_dedup_char_shingles" -> Q(
      (s, dir) => Dedup.jaccardPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 100), "doc_id", "text",
        threshold = 0.65, tokenizer = Dedup.charShingles(_, 3))
        .select(col("id_a"), col("id_b"), col("inter"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (
          SELECT doc_id AS id, unnest(list_distinct(
            list_transform(range(1, greatest(length(text) - 1, 2)),
              i -> substring(text, cast(i AS INT), 3)))) AS tok
          FROM documents WHERE doc_id < 100),
        sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY 1),
        inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2)
        SELECT id_a, id_b, inter,
               round(cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
        FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
        WHERE cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) >= 0.65
        ORDER BY id_a, id_b""")),

    // ---- TF-IDF top terms per document ----
    "x12_tfidf_terms" -> Q(
      (s, dir) => TextAnalysis.tfIdfTopTerms(
        Tables.documents(s, dir), "doc_id", "text", k = 3)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("rank"), col("term"), round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("doc_id"), col("rank")),
      Some("""WITH terms AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT doc_id, term, tf * ln(cast(n.n AS DOUBLE) / df) AS tfidf
          FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
                   FROM scored)
        SELECT doc_id, cast(rank AS INT) AS rank, term, round(tfidf, 6) AS tfidf
        FROM ranked WHERE rank <= 3 AND doc_id < 100
        ORDER BY doc_id, rank""")),

    // ---- embedding cosine near-dup pairs (brute among a bounded slice;
    // the LSH path is the scale form) ----
    "x13_embedding_neardup" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir).filter(col("vec_id") < 150)
          .select(col("vec_id"), col("embedding"))
        e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
          .withColumn("cos", round(Similarity.cosine(col("a.embedding"), col("b.embedding")), 6))
          .filter(col("cos") >= 0.3)
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b, s.c AS cos
        FROM embeddings a, embeddings b,
          LATERAL (SELECT round(sum(x::DOUBLE * y::DOUBLE)
                     / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))), 6) AS c
                   FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y)) s
        WHERE a.vec_id < 150 AND b.vec_id < 150 AND a.vec_id < b.vec_id AND s.c >= 0.3
        ORDER BY id_a, id_b""")),

    // ---- capstone: the full curation pipeline — quality filter, exact
    // dedup, near-dup removal (keep the lowest id of each pair) ----
    "x14_curation_pipeline" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
        val quality = docs.filter(TextAnalysis.qualityScore(col("text")) >= 0.7)
        val exactKeep = Dedup.exact(quality, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val nearDupLosers = Dedup.jaccardPairs(quality, "doc_id", "text", 0.8)
          .select(col("id_b").as("doc_id")).distinct()
        quality.join(exactKeep, Seq("doc_id"), "left_semi")
          .join(nearDupLosers, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH q AS (
          SELECT doc_id, lang, n_chars, text,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ltoks,
            list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
          FROM documents WHERE doc_id < 200),
        scored AS (
          SELECT *,
            (CASE WHEN length(text) BETWEEN 200 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
             + CASE WHEN cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
             + CASE WHEN cast(len(list_filter(ltoks, x -> x IN ('the','a','an','of','and','to','in','is','it','that'))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality
          FROM q),
        kept AS (SELECT * FROM scored WHERE quality >= 0.7),
        exact_keep AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
        ktoks AS (SELECT doc_id AS id, unnest(list_distinct(ltoks)) AS tok FROM kept),
        sizes AS (SELECT id, count(*) AS sz FROM ktoks GROUP BY 1),
        losers AS (
          SELECT DISTINCT b.id AS doc_id
          FROM ktoks a JOIN ktoks b ON a.tok = b.tok AND a.id < b.id
          GROUP BY a.id, b.id
          HAVING cast(count(*) AS DOUBLE) /
            ((SELECT sz FROM sizes WHERE id = a.id) + (SELECT sz FROM sizes WHERE id = b.id) - count(*)) >= 0.8)
        SELECT k.doc_id, k.lang, k.n_chars FROM kept k
        JOIN exact_keep e ON k.doc_id = e.doc_id
        WHERE k.doc_id NOT IN (SELECT doc_id FROM losers)
        ORDER BY k.doc_id""")),

    // ---- MinHash + banded LSH, candidates-then-verify: LSH proposes pairs,
    // exact Jaccard over full token sets disposes. The output equals the
    // exact inverted-index result iff band recall is total (P ≈ 1−8e-8 per
    // pair at j=0.8 with 16 bands × 2 rows), so the result-equality oracle
    // genuinely gates LSH recall — not just the rescore arithmetic. ----
    "x3_minhash_candidates" -> Q(
      (s, dir) => Dedup.minhashNearDupPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id", "text",
        threshold = 0.8, numHashes = 32, numBands = 16)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (
          SELECT doc_id AS id, unnest(list_distinct(
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS tok
          FROM documents WHERE doc_id < 200),
        sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY 1),
        inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2)
        SELECT id_a, id_b, inter,
               cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
        FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
        WHERE cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8
        ORDER BY id_a, id_b""")),

    // ---- SimHash pairs in the pigeonhole-complete region: with 8 chunks of
    // 8 bits, EVERY pair within hamming 7 shares a chunk, so blocking +
    // filter h<=7 returns exactly {pairs : hamming <= 7} — no probabilistic
    // recall. The token hash is portable integer math, so DuckDB recomputes
    // the identical 64 sign bits and the oracle verifies the simhash itself. ----
    "x4_simhash_pairs" -> Q(
      (s, dir) => Dedup.simhashPairs(
        Dedup.simhash(Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id", "text"),
        maxHamming = 7, numChunks = 8)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (
          SELECT doc_id AS id, tok, count(*) AS tf FROM (
            SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok
            FROM documents WHERE doc_id < 200) GROUP BY 1, 2),
        h AS (SELECT id, tf, list_reduce(list_prepend(cast(0 AS BIGINT),
                list_transform(range(1, length(tok) + 1),
                  i -> cast(ascii(substring(tok, cast(i AS INT), 1)) AS BIGINT))),
                (acc, c) -> (acc * 31 + c) % 1000000007) AS th
              FROM toks),
        bits AS (
          SELECT id, b.bit,
            CASE WHEN sum(CASE WHEN ((th * ((b.bit * 2654435761 + 1) % 1000000007) + b.bit) % 1000000007) % 2 = 1
                               THEN tf ELSE -tf END) > 0 THEN 1 ELSE 0 END AS sgn
          FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
          GROUP BY 1, 2),
        pairs AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 sum(CASE WHEN a.sgn <> b.sgn THEN 1 ELSE 0 END) AS hamming
          FROM bits a JOIN bits b ON a.bit = b.bit AND a.id < b.id
          GROUP BY 1, 2)
        SELECT id_a, id_b, cast(hamming AS INT) AS hamming
        FROM pairs WHERE hamming <= 7 ORDER BY id_a, id_b""")),

    // ---- brute-force cosine top-k (exact ANN baseline, oracle-checked) ----
    "x5_ann_cosine" -> Q(
      (s, dir) => Similarity.bruteForceTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, s.c AS cos
          FROM embeddings q, embeddings c,
            LATERAL (SELECT sum(x::DOUBLE * y::DOUBLE)
                            / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS c
                     FROM (SELECT unnest(q.embedding) AS x, unnest(c.embedding) AS y)) s
          WHERE q.vec_id IN (0, 1, 2, 3, 4) AND c.vec_id <> q.vec_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cast(rank AS INT) AS rank, round(cos, 6) AS cos
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- SRP-LSH bucketed ANN, candidates-then-verify: same-bucket
    // candidates are exact-rescored, so the top-k equals the brute-force
    // oracle iff LSH recall@k is total at these parameters — the oracle
    // equality is a genuine recall gate for the 100 TB ANN path. ----
    "x6_ann_lsh" -> Q(
      (s, dir) => Similarity.lshTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5, numPlanes = 3, numTables = 24)
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, s.c AS cos
          FROM embeddings q, embeddings c,
            LATERAL (SELECT sum(x::DOUBLE * y::DOUBLE)
                            / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS c
                     FROM (SELECT unnest(q.embedding) AS x, unnest(c.embedding) AS y)) s
          WHERE q.vec_id IN (0, 1, 2, 3, 4) AND c.vec_id <> q.vec_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cast(rank AS INT) AS rank, round(cos, 6) AS cos
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- IVF coarse-quantized ANN (the other scale path besides LSH),
    // candidates-then-verify: probed posting lists are exact-rescored. The
    // gate runs the exhaustive probe (nprobe = numCentroids) so equality
    // with brute force is deterministic and verifies the whole IVF machinery
    // (codebook, assignment, posting-list join, rescore); the approximate
    // operating point (nprobe 8: ~half the corpus scanned) is recall-tested
    // in DedupSimilaritySpec — these synthetic near-uniform embeddings are
    // IVF's worst case, so no honest partial probe has total recall here. ----
    "x15_ann_ivf" -> Q(
      (s, dir) => Similarity.ivfTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5, numCentroids = 16, nprobe = 16)
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, s.c AS cos
          FROM embeddings q, embeddings c,
            LATERAL (SELECT sum(x::DOUBLE * y::DOUBLE)
                            / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS c
                     FROM (SELECT unnest(q.embedding) AS x, unnest(c.embedding) AS y)) s
          WHERE q.vec_id IN (0, 1, 2, 3, 4) AND c.vec_id <> q.vec_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, cast(rank AS INT) AS rank, round(cos, 6) AS cos
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- product-quantization ANN (the compressed-domain scale path: scan
    // m code bytes per vector, not the vectors). Unlike x6/x15 the oracle
    // REPLAYS the whole PQ pipeline in SQL — deterministic strided codebook,
    // integer-scaled sub-distances, ADC shortlist, exact re-rank — so the
    // gate is value-exact independent of recall (recall is spec-tested). ----
    "x46_ann_pq" -> Q(
      (s, dir) => Similarity.pqTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5,
        numSubspaces = 8, numCodes = 16, codebookStride = 7, shortlist = 64)
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH nv AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE / sqrt(n2)) AS v
          FROM (SELECT vec_id, embedding,
                  (SELECT sum(x::DOUBLE * x::DOUBLE) FROM unnest(embedding) AS t(x)) AS n2
                FROM embeddings)),
        cb AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
          FROM (SELECT * FROM nv WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 16)),
        subd AS (
          SELECT n.vec_id, r.j, cb.c,
            CAST(round((SELECT sum((z.a - z.b) * (z.a - z.b))
                        FROM (SELECT unnest(n.v[r.j * 8 + 1 : r.j * 8 + 8]) AS a,
                                     unnest(cb.v[r.j * 8 + 1 : r.j * 8 + 8]) AS b) z) * 1e6)
                 AS BIGINT) AS d
          FROM nv n, range(0, 8) AS r(j), cb),
        codes AS (
          SELECT vec_id, j, c AS code FROM (
            SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
            FROM subd) WHERE rn = 1),
        adc AS (
          SELECT sd.vec_id AS query_id, co.vec_id AS neighbor_id, CAST(sum(sd.d) AS BIGINT) AS adc
          FROM codes co JOIN subd sd ON sd.j = co.j AND sd.c = co.code
          WHERE sd.vec_id IN (0, 1, 2, 3, 4) AND co.vec_id <> sd.vec_id
          GROUP BY 1, 2),
        short AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS srk
          FROM adc),
        rer AS (
          SELECT s.query_id, s.neighbor_id, x.c AS cos
          FROM short s
          JOIN embeddings q ON q.vec_id = s.query_id
          JOIN embeddings cd ON cd.vec_id = s.neighbor_id,
          LATERAL (SELECT sum(x::DOUBLE * y::DOUBLE)
                          / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS c
                   FROM (SELECT unnest(q.embedding) AS x, unnest(cd.embedding) AS y)) x
          WHERE s.srk <= 64),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
            row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM rer)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS cos
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- embedding near-dup pairs via SRP-LSH bucketing — the 100 TB form
    // of x13's bounded cross-join baseline, candidates-then-verify: equality
    // with the exact all-pairs oracle gates bucket recall at the threshold. ----
    "x17_embedding_neardup_lsh" -> Q(
      (s, dir) => Similarity.lshNearDupPairs(
        Tables.embeddings(s, dir).filter(col("vec_id") < 150), "vec_id", "embedding",
        // op threshold slightly under the display cut: the oracle filters on
        // the ROUNDED cosine, so boundary pairs must survive into the round
        threshold = 0.2999995, numPlanes = 2, numTables = 24)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy(col("id_a"), col("id_b")),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b, s.c AS cos
        FROM embeddings a, embeddings b,
          LATERAL (SELECT round(sum(x::DOUBLE * y::DOUBLE)
                     / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))), 6) AS c
                   FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y)) s
        WHERE a.vec_id < 150 AND b.vec_id < 150 AND a.vec_id < b.vec_id AND s.c >= 0.3
        ORDER BY id_a, id_b""")),

    // ---- near-dup clusters: connected components over the exact jaccard
    // pair set — the "keep one per duplicate group" step; oracle recomputes
    // components via a recursive transitive closure ----
    "x18_neardup_clusters" -> Q(
      (s, dir) => Dedup.nearDupClusters(
        Dedup.jaccardPairs(
          Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id", "text", 0.8))
        .orderBy(col("doc_id")),
      Some("""WITH RECURSIVE
        toks AS (
          SELECT doc_id AS id, unnest(list_distinct(
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS tok
          FROM documents WHERE doc_id < 200),
        sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY 1),
        inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
          WHERE cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src)
        SELECT doc_id, cluster_id FROM comp ORDER BY doc_id""")),

    // ---- skew-salted two-stage aggregation: must equal the plain group-by
    // (the salt only changes the shuffle shape, never the result) ----
    "x16_skew_salted_agg" -> Q(
      (s, dir) => Skew.saltedSum(
        Tables.lineitem(s, dir)
          .withColumn("q", col("l_quantity").cast(DecimalType(38, 6))),
        Seq("l_returnflag"), "q", distinctBy = col("l_orderkey"), saltBuckets = 16)
        .select(col("l_returnflag"),
          (col("sum_q") * lit(1000000L)).cast("long").as("sum_qty"), col("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
          cast(sum(cast(l_quantity AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_qty,
          count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // ---- skew-salted fact-dim join: must equal the plain join (salting
    // only spreads a hot key over saltBuckets tasks, never changes rows);
    // aggregated so the oracle is order-free ----
    "x24_skew_salted_join" -> Q(
      // distinctBy varies WITHIN an orderkey (the salt must spread a hot
      // key's rows, not move them together); threshold 5 makes 6+-line
      // orders take the salted path so both paths are exercised and must
      // still reproduce the plain join exactly
      (s, dir) => Skew.saltedJoin(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_returnflag"),
          col("l_linenumber"),
          col("l_quantity").cast(DecimalType(38, 6)).as("q")),
        Tables.orders(s, dir).select(col("o_orderkey").as("l_orderkey"),
          col("o_orderpriority")),
        key = "l_orderkey", distinctBy = col("l_linenumber"), saltBuckets = 16,
        hotKeyThreshold = 5L)
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg((sum(col("q")) * lit(1000000L)).cast("long").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"), col("l_returnflag")),
      Some("""SELECT o_orderpriority, l_returnflag,
          cast(sum(cast(l_quantity AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_qty,
          count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- text statistics: token counts, quality, lang-ID heuristic ----
    "x7_text_stats" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.wordCount(col("text")).as("n_words"),
          TextAnalysis.regexTokenCount(col("text")).as("n_bpeish_tokens"),
          TextAnalysis.avgWordLen(col("text")).as("avg_word_len"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
          TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
          TextAnalysis.langIdHeuristic(col("text")).as("lang_guess"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
          SELECT doc_id, text,
            list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ltoks
          FROM documents),
        m AS (SELECT doc_id, text, toks, ltoks,
            cast(len(toks) AS BIGINT) AS n_words,
            len(list_filter(ltoks, x -> x IN ('the','a','an','of','and','to','in','is','it','that'))) AS en_hits,
            len(list_filter(ltoks, x -> x IN ('der','die','das','und','ist','nicht','ein','zu','den','mit'))) AS de_hits,
            len(list_filter(ltoks, x -> x IN ('le','la','les','et','est','un','une','des','que','pour'))) AS fr_hits,
            len(list_filter(ltoks, x -> x IN ('el','la','los','las','y','es','un','una','que','por'))) AS es_hits,
            cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1) AS punct_ratio
          FROM t)
        SELECT doc_id, n_words,
          cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish_tokens,
          cast(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / greatest(n_words, 1) AS avg_word_len,
          punct_ratio,
          cast(en_hits AS DOUBLE) / greatest(n_words, 1) AS stopword_ratio,
          CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0 THEN 'unk'
               WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'en'
               WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'de'
               WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'fr'
               ELSE 'es' END AS lang_guess,
          (CASE WHEN length(text) BETWEEN 200 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
           + CASE WHEN punct_ratio <= 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
           + CASE WHEN cast(en_hits AS DOUBLE) / greatest(n_words, 1) >= 0.01 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality
        FROM m ORDER BY doc_id""")),

    // ---- order-sensitive rolling-hash document fingerprint ----
    "x8_fingerprint" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          list_reduce(
            list_prepend(cast(0 AS BIGINT),
              list_transform(list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                w -> cast(ascii(w) AS BIGINT) * 256 + length(w))),
            (h, v) -> (h * 31 + v) % 1000000007) AS fp
        FROM documents ORDER BY doc_id""")),

    // ---- multimodal: REAL header decode (BMP/PNG dims, JPEG SOF dims via
    // marker-segment walk, GIF logical-screen dims, WAV audio params, utf8
    // fallback) over a deterministic mixed corpus — synthetic bytes are
    // built from closed-form id-derived parameters, so the oracle verifies
    // the decoder inverts each encoder, field for field. ----
    "x9_multimodal_decode" -> Q(
      (s, dir) => Multimodal.decode(s,
          Multimodal.syntheticMedia(Tables.documents(s, dir), "doc_id", "text"))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          cast(CASE WHEN doc_id % 5 = 0 THEN 54 + (((doc_id % 64 + 1) * 3 + 3) // 4) * 4 * (doc_id % 48 + 1)
                    WHEN doc_id % 5 = 1 THEN 44 + (100 + doc_id % 50) * (doc_id % 2 + 1) * 2
                    WHEN doc_id % 5 = 2 THEN 35
                    WHEN doc_id % 5 = 3 THEN 14
                    ELSE octet_length(encode(text)) END AS BIGINT) AS n_bytes,
          CASE WHEN doc_id % 5 = 0 THEN 'bmp' WHEN doc_id % 5 = 1 THEN 'wav'
               WHEN doc_id % 5 = 2 THEN 'jpeg' WHEN doc_id % 5 = 3 THEN 'gif'
               ELSE 'utf8-text' END AS format_guess,
          cast(CASE WHEN doc_id % 5 = 0 THEN doc_id % 64 + 1
                    WHEN doc_id % 5 = 2 THEN doc_id % 100 + 1
                    WHEN doc_id % 5 = 3 THEN doc_id % 32 + 1 END AS INT) AS width,
          cast(CASE WHEN doc_id % 5 = 0 THEN doc_id % 48 + 1
                    WHEN doc_id % 5 = 2 THEN doc_id % 80 + 1
                    WHEN doc_id % 5 = 3 THEN doc_id % 24 + 1 END AS INT) AS height,
          cast(CASE WHEN doc_id % 5 = 1 THEN doc_id % 2 + 1 END AS INT) AS channels,
          cast(CASE WHEN doc_id % 5 = 1 THEN 8000 + (doc_id % 8) * 1000 END AS INT) AS sample_rate,
          cast(CASE WHEN doc_id % 5 = 1 THEN 100 + doc_id % 50 END AS BIGINT) AS n_samples,
          cast(CASE WHEN doc_id % 5 = 4 THEN list_sum(list_transform(range(1, least(length(text), 16) + 1),
            i -> ascii(substring(text, cast(i AS INT), 1)))) END AS BIGINT) AS byte_sum_16
        FROM documents ORDER BY doc_id""")),

    // ---- repeated-2-gram fraction (Gopher/MassiveText repetition filter):
    // exact integer ratio in double math, bit-identical across engines ----
    "x19_repetition_score" -> Q(
      (s, dir) => Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          round(TextAnalysis.repetitionScore(col("text"), 2), 6).as("rep_2gram"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents WHERE doc_id < 200),
        g AS (
          SELECT doc_id, list_transform(range(1, len(toks)),
            i -> concat_ws(' ', toks[i], toks[i+1])) AS gs
          FROM t)
        SELECT doc_id,
          round(CASE WHEN len(gs) = 0 THEN 0.0
                     ELSE 1.0 - len(list_distinct(gs))::DOUBLE / len(gs) END, 6) AS rep_2gram
        FROM g ORDER BY doc_id""")),

    // ---- mean unigram log-prob under the corpus's own distribution (the
    // cheap CCNet/KenLM perplexity stand-in); frequency table built over the
    // FULL corpus, scored docs are a slice ----
    "x20_unigram_logprob" -> Q(
      (s, dir) => TextAnalysis.unigramLogProb(
        Tables.documents(s, dir), "doc_id", "text")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logprob"), 4).as("avg_logprob"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok
          FROM documents),
        freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        tot AS (SELECT sum(cnt)::DOUBLE AS tot FROM freq)
        SELECT doc_id, count(*) AS n_tokens,
          round(avg(ln(cnt::DOUBLE / tot)), 4) AS avg_logprob
        FROM toks JOIN freq USING (tok) CROSS JOIN tot
        WHERE doc_id < 100
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- PII redaction over a deterministically augmented corpus (each doc
    // gets a synthetic email/phone/id suffix so the regexes demonstrably
    // fire); both engines apply identical RE2-safe patterns ----
    "x21_pii_redact" -> Q(
      (s, dir) => Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"),
          TextAnalysis.redactPii(concat(
            col("text"),
            lit(" Contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1-555-"),
            lpad(pmod(col("doc_id") * 7919, lit(10000000L)).cast("string"), 7, "0"),
            lit(" ref "),
            (col("doc_id") * col("doc_id") * lit(1000003L) + lit(10000000L)).cast("string")
          )).as("redacted"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                text || ' Contact user' || doc_id::VARCHAR || '@example.com or +1-555-' ||
                  lpad(((doc_id * 7919) % 10000000)::VARCHAR, 7, '0') ||
                  ' ref ' || (doc_id * doc_id * 1000003 + 10000000)::VARCHAR,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\+\d[\d-]{7,}\d', '<PHONE>', 'g'),
            '\b\d{7,}\b', '<NUM>', 'g') AS redacted
        FROM documents WHERE doc_id < 100 ORDER BY doc_id""")),

    // ---- deterministic train/val/test split: portable affine-mod-prime
    // bucket, so the oracle verifies MEMBERSHIP row-for-row (adding docs
    // never reassigns existing ones) ----
    "x22_hash_split" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), Sampling.splitLabel(col("doc_id")).as("split"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id,
                ((doc_id * 2654435761 + 12345) % 1000000007) % 100 AS b
              FROM documents)
        ORDER BY doc_id""")),

    // ---- exact-count stratified sample (10% per language, hash-ordered):
    // every stratum represented, deterministic membership ----
    "x23_stratified_sample" -> Q(
      (s, dir) => Sampling.stratifiedSampleByHash(
        Tables.documents(s, dir), "lang", "doc_id", 0.10)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some("""WITH h AS (
          SELECT doc_id, lang,
            ((doc_id * 2654435761 + 12345) % 1000000007) % 1000000 AS hb
          FROM documents),
        r AS (
          SELECT doc_id, lang,
            row_number() OVER (PARTITION BY lang ORDER BY hb, doc_id) AS rn,
            count(*) OVER (PARTITION BY lang) AS n
          FROM h)
        SELECT doc_id, lang FROM r WHERE rn <= ceil(n::DOUBLE * 0.10)
        ORDER BY doc_id""")),

    // ---- as-of join: latest purchase state at each click, per user.
    // Single-shuffle union+window form vs DuckDB's native ASOF JOIN ----
    "x25_asof_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        // unique (user, time) on the right side: equal-time duplicates have
        // no deterministic "latest" (both engines would pick arbitrarily)
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("p_value"))
          .withColumnRenamed("ts", "p_ts")
        TemporalJoin.asofJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts",
            Seq("p_value", "p_ts"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("p_value"), col("p_ts"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
          SELECT user_id, ts AS p_ts, max(value) AS p_value
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, c.ts, p.p_value, p.p_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
        ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.p_ts
        ORDER BY event_id""")),

    // ---- bounded range join: clicks within 6 hours after each error,
    // per user — bucketed equi-join, never a theta/nested-loop join ----
    "x26_range_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"))
        TemporalJoin.rangeJoinBucketed(errors, clicks, Seq("user_id"),
            "ts", "c_ts", windowMicros = 6L * 3600 * 1000000)
          .groupBy(col("event_id"), col("user_id"), col("ts"))
          .agg(count(lit(1)).as("n_follow"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, e.user_id, e.ts, count(*) AS n_follow
        FROM events e JOIN events c
          ON c.user_id = e.user_id
          AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 6 HOUR
        WHERE e.event_type = 'error' AND c.event_type = 'click'
        GROUP BY 1, 2, 3 ORDER BY 1""")),

    // ---- the dedup endgame: drop every non-canonical near-dup cluster
    // member, keep canonical representatives + unclustered docs ----
    "x27_dedup_canonical" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
        val clusters = Dedup.nearDupClusters(
          Dedup.jaccardPairs(docs, "doc_id", "text", 0.8))
        Dedup.keepCanonical(docs, clusters, "doc_id")
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE
        toks AS (
          SELECT doc_id AS id, unnest(list_distinct(
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS tok
          FROM documents WHERE doc_id < 200),
        sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY 1),
        inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
          WHERE cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src)
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id < 200
          AND doc_id NOT IN (SELECT doc_id FROM comp WHERE cluster_id <> doc_id)
        ORDER BY doc_id""")),

    // ---- distribution statistics: exact linear-interpolated quantiles
    // per group (what a curation pipeline thresholds on). Exact percentile
    // is the oracle-checkable form; at 100 TB swap in approx_percentile
    // (t-digest, single pass, mergeable) with the same call shape ----
    "x28_percentiles" -> Q(
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5D)"), 6).as("p50"),
          round(expr("percentile(value, 0.9D)"), 6).as("p90"),
          round(expr("percentile(value, 0.99D)"), 6).as("p99"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
          round(quantile_cont(value, 0.5), 6) AS p50,
          round(quantile_cont(value, 0.9), 6) AS p90,
          round(quantile_cont(value, 0.99), 6) AS p99,
          count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- the 100 TB quantile path, VERIFIED not asserted: x28's scaladoc
    // names approx_percentile (t-digest-style mergeable sketch, single
    // pass) as the at-scale swap — this query gates its rank stability.
    // For each group the sketch value must land inside the EXACT
    // interpolated [q-0.01, q+0.01] band (sketch rank error at accuracy
    // 10000 is 1e-4, two orders tighter); groups too small for the band to
    // be meaningful (< 200 rows, where order statistics vs interpolation
    // quantization dominates) are reported trivially stable. The oracle
    // pins every flag to 1: any drift outside the band at any SF
    // hash-fails the gate. ----
    "x44_approx_percentiles" -> Q(
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("approx_percentile(value, array(0.5D, 0.9D, 0.99D), 10000)").as("ap"),
          expr("percentile(value, array(0.49D, 0.51D, 0.89D, 0.91D, 0.98D, 1.0D))").as("ex"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          when(col("n") < 200, lit(1)).otherwise(
            (col("ap")(0) >= col("ex")(0) && col("ap")(0) <= col("ex")(1)).cast("int"))
            .as("p50_rank_stable"),
          when(col("n") < 200, lit(1)).otherwise(
            (col("ap")(1) >= col("ex")(2) && col("ap")(1) <= col("ex")(3)).cast("int"))
            .as("p90_rank_stable"),
          when(col("n") < 200, lit(1)).otherwise(
            (col("ap")(2) >= col("ex")(4) && col("ap")(2) <= col("ex")(5)).cast("int"))
            .as("p99_rank_stable"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
          1 AS p50_rank_stable, 1 AS p90_rank_stable, 1 AS p99_rank_stable
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- the 100 TB distinct-count path, same treatment: A11's
    // approx_count_distinct (HLL++, one pass, mergeable, no per-group set)
    // must land within 5% of the exact count per group (rsd 0.02 → ~2σ
    // headroom), with an absolute-1 floor for tiny groups. Oracle pins the
    // flag to 1 and carries the exact counts for substance. ----
    "x45_approx_distinct" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("exact_sources"),
          approx_count_distinct(col("source"), 0.02).as("__approx"))
        .select(col("lang"), col("n_docs"), col("exact_sources"),
          (abs(col("__approx") - col("exact_sources")) <=
            greatest(lit(1L), (col("exact_sources").cast("double") * 0.05).cast("long")))
            .cast("int").as("approx_within_5pct"))
        .orderBy(col("lang")),
      Some("""SELECT lang, count(*) AS n_docs,
          count(DISTINCT source) AS exact_sources, 1 AS approx_within_5pct
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // ---- tokenizer-REAL token counts: the BPE merge walk (codegen'd
    // expression over a validated merge table) feeding sequence packing —
    // the exact count/budget pipeline a pretraining mix is built with.
    // The oracle replays the merge walk LITERALLY (rank-order string
    // replaces generated from the same merge list) and the packing window,
    // so both the tokenizer and its downstream consumer are hash-gated. ----
    "x69_bpe_counts" -> Q(
      (s, dir) => Sampling.packSequences(
          Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text")),
          groupCol = "source", idCol = "doc_id",
          tokenCountCol = TextAnalysis.bpeTokenCount(col("text"),
            TextAnalysis.demoBpeMerges),
          budget = 2048L)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("bin_id"))
        .orderBy(col("doc_id")),
      Some(s"""WITH w AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
          FROM documents),
        wt AS (
          SELECT doc_id, sum(${TextAnalysis.bpeOracleCountSql("word", TextAnalysis.demoBpeMerges)}) AS toks
          FROM w GROUP BY 1),
        d AS (
          SELECT doc_id, source, cast(coalesce(wt.toks, 0) AS BIGINT) AS n_tokens
          FROM documents LEFT JOIN wt USING (doc_id))
        SELECT doc_id, source, n_tokens,
          cast(floor(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT) AS bin_id
        FROM d ORDER BY doc_id""")),

    // ---- tokenizer-real ENCODE: the same BPE walk emitting token IDS
    // (array<long>: code points for unmerged chars, MergedIdBase + rank
    // for merge outputs), exploded to (doc_id, pos, token_id) rows so the
    // hash gate covers every id at every position. The oracle replays the
    // walk AND the id assignment (a generated CASE over the merge list —
    // one source of truth for both sides). ----
    "x72_bpe_encode" -> Q(
      (s, dir) => Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id"),
          posexplode(TextAnalysis.bpeEncode(col("text"), TextAnalysis.demoBpeMerges)))
        .select(col("doc_id"), col("pos"), col("col").as("token_id"))
        .orderBy(col("doc_id"), col("pos")),
      Some(s"""WITH w AS (
          SELECT doc_id, flatten(list_transform(
            list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
            w -> ${TextAnalysis.bpeOracleEncodeSql("w", TextAnalysis.demoBpeMerges)})) AS ids
          FROM documents WHERE doc_id < 300)
        SELECT doc_id, cast(unnest(range(len(ids))) AS INT) AS pos,
               unnest(ids) AS token_id
        FROM w ORDER BY doc_id, pos""")),

    // ---- multimodal: perceptual-hash (dHash) image near-dup detection —
    // the image counterpart of text/embedding dedup. The synthetic corpus
    // plants near-duplicates (groups of 4 sharing a base pattern, variants
    // perturbing one cell); dHash + banded 64-bit Hamming (4 chunks,
    // maxHamming 3 => pigeonhole-total recall) finds exactly
    // {pairs : hamming <= 3}. The oracle replays the BMP pixel closed form,
    // the dHash bit packing (two's complement via the i=63 term), and the
    // exact popcount filter — the whole chain, hash-gated. ----
    "x70_image_neardup" -> Q(
      (s, dir) => Multimodal.imageNearDupPairs(s,
          Multimodal.syntheticImages(
            Tables.documents(s, dir).filter(col("doc_id") < 400), "doc_id"),
          maxHamming = 3, numChunks = 4)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH params AS (
          SELECT doc_id, doc_id % 4 AS v, (doc_id // 4) % 7 + 1 AS a,
                 (doc_id // 4) % 11 + 3 AS b, (doc_id // 4) % 251 AS c,
                 doc_id // 4 AS grp
          FROM documents WHERE doc_id < 400),
        bits AS (
          SELECT doc_id, i,
            CASE WHEN
              (a*((i%8+1)+1)*((i%8+1)+2) + b*((i//8)+1)*((i%8+1)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8+1) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
              >
              (a*((i%8)+1)*((i%8)+2) + b*((i//8)+1)*((i%8)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
            THEN CASE WHEN i = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << cast(i AS INT)) END
            ELSE 0 END AS bit
          FROM params, LATERAL (SELECT unnest(range(64)) AS i)),
        hashes AS (SELECT doc_id, cast(sum(bit) AS BIGINT) AS h FROM bits GROUP BY 1)
        SELECT x.doc_id AS id_a, y.doc_id AS id_b,
               cast(bit_count(xor(x.h, y.h)) AS INT) AS hamming
        FROM hashes x JOIN hashes y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.h, y.h)) <= 3
        ORDER BY 1, 2""")),

    // ---- multimodal: REAL compressed-image decode (JDK ImageIO) feeding
    // the same dHash. The corpus is the x70 pixel closed form re-encoded
    // as actual PNG and GIF files (both lossless; achromatic pixels make
    // the BT.601 integer luma an exact pass-through), so the engine runs
    // bytes -> ImageIO decode -> luma -> dHash while the oracle replays
    // the pixels arithmetically — the whole real-decoder chain hash-gated.
    // JPEG (genuinely lossy) is spec-gated with a Hamming tolerance in
    // DHashSpec instead. ----
    "x71_image_dhash_decode" -> Q(
      (s, dir) => Multimodal.dHash64(s,
          Multimodal.syntheticLosslessImages(
            Tables.documents(s, dir).filter(col("doc_id") < 300), "doc_id"))
        .orderBy(col("id")),
      Some("""WITH params AS (
          SELECT doc_id, doc_id % 4 AS v, (doc_id // 4) % 7 + 1 AS a,
                 (doc_id // 4) % 11 + 3 AS b, (doc_id // 4) % 251 AS c,
                 doc_id // 4 AS grp
          FROM documents WHERE doc_id < 300),
        bits AS (
          SELECT doc_id, i,
            CASE WHEN
              (a*((i%8+1)+1)*((i%8+1)+2) + b*((i//8)+1)*((i%8+1)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8+1) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
              >
              (a*((i%8)+1)*((i%8)+2) + b*((i//8)+1)*((i%8)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
            THEN CASE WHEN i = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << cast(i AS INT)) END
            ELSE 0 END AS bit
          FROM params, LATERAL (SELECT unnest(range(64)) AS i)),
        hashes AS (SELECT doc_id, cast(sum(bit) AS BIGINT) AS h FROM bits GROUP BY 1)
        SELECT doc_id AS id, h AS simhash FROM hashes ORDER BY 1""")),

    // ---- multimodal: AUDIO perceptual fingerprinting — 16-bit PCM WAV
    // parsed from bytes, frames windowed (65 equal windows, floor
    // arithmetic), per-window |sample| energy, bit i = [e(i+1) > e(i)]
    // (the Haitsma-Kalper energy-sign shape in exact integer math). The
    // synthetic corpus plants near-duplicates exactly like the image one;
    // the oracle replays sample generation, windowing, energies, and the
    // bit packing — the full bytes -> PCM -> fingerprint chain hash-gated.
    // Near-dup pairs ride the same banded-Hamming join as x70 (spec-gated
    // in AudioFingerprintSpec; the hash equality here subsumes it). ----
    "x74_audio_fingerprint" -> Q(
      (s, dir) => Multimodal.audioFingerprint64(s,
          Multimodal.syntheticAudio(
            Tables.documents(s, dir).filter(col("doc_id") < 300), "doc_id"))
        .orderBy(col("id")),
      Some("""WITH params AS (
          SELECT doc_id, doc_id % 4 AS v,
                 (doc_id // 4) * 2654435761 % 9973 + 17 AS f,
                 (doc_id // 4) % 97 AS c, doc_id // 4 AS grp
          FROM documents WHERE doc_id < 300),
        samples AS (
          SELECT doc_id, t,
            ((f*(t+1)*(t+2) + c*(t+1) + 13*grp
              + CASE WHEN v > 0 AND t = 2*v THEN 5000 ELSE 0 END) % 30000) - 15000 AS s,
            (t * 65) // 130 AS wnd
          FROM params, LATERAL (SELECT unnest(range(130)) AS t)),
        energies AS (SELECT doc_id, wnd, sum(abs(s)) AS e FROM samples GROUP BY 1, 2),
        bits AS (
          SELECT lo.doc_id, lo.wnd AS i,
            CASE WHEN hi.e > lo.e THEN
              CASE WHEN lo.wnd = 63 THEN -9223372036854775807 - 1
                   ELSE (1::BIGINT << cast(lo.wnd AS INT)) END
            ELSE 0 END AS bit
          FROM energies lo JOIN energies hi
            ON lo.doc_id = hi.doc_id AND hi.wnd = lo.wnd + 1
          WHERE lo.wnd < 64)
        SELECT doc_id AS id, cast(sum(bit) AS BIGINT) AS simhash
        FROM bits GROUP BY 1 ORDER BY 1""")),

    // ---- the SERIALIZATION capstone: documents BPE-encoded, packed into
    // fixed-budget bins (x69's packSequences), and emitted as each bin's
    // CONCATENATED token stream — (source, bin_id, pos, token_id) with pos
    // the global offset inside the bin. x69 gates the counts/binning and
    // x72 the per-doc ids; this gates their COMPOSITION (bin offsets +
    // concatenation order), i.e. the actual artifact a pretraining run
    // memory-maps. Two window shuffles + one explode; scan-pipelined
    // otherwise. ----
    "x76_pack_stream" -> Q(
      (s, dir) => {
        val demo = TextAnalysis.demoBpeMerges
        val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
          .select(col("doc_id"), col("source"),
            TextAnalysis.bpeEncode(col("text"), demo).as("ids"))
        val packed = Sampling.packSequences(
          docs, groupCol = "source", idCol = "doc_id",
          tokenCountCol = size(col("ids")).cast("long"), budget = 512L)
        val w = Window.partitionBy(col("source"), col("bin_id"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        packed
          .withColumn("doc_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .select(col("source"), col("bin_id"), col("doc_off"),
            posexplode(col("ids")))
          .select(col("source"), col("bin_id"),
            (col("doc_off") + col("pos")).as("pos"), col("col").as("token_id"))
          .orderBy(col("source"), col("bin_id"), col("pos"))
      },
      Some(s"""WITH w AS (
          SELECT doc_id, source, flatten(list_transform(
            list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
            w -> ${TextAnalysis.bpeOracleEncodeSql("w", TextAnalysis.demoBpeMerges)})) AS ids
          FROM documents WHERE doc_id < 300),
        d AS (SELECT doc_id, source, ids, len(ids) AS n_tokens FROM w),
        b AS (SELECT *, cast(floor(coalesce(sum(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS bin_id
              FROM d),
        o AS (SELECT *, cast(coalesce(sum(n_tokens) OVER (
                PARTITION BY source, bin_id ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS doc_off
              FROM b)
        SELECT source, bin_id, doc_off + unnest(range(len(ids))) AS pos,
               unnest(ids) AS token_id
        FROM o ORDER BY source, bin_id, pos""")),

    // ---- multimodal: VIDEO near-dup — a real container walk (motion-BMP:
    // frame extents from each frame's own BMP size field), per-frame
    // dHash, per-video DISTINCT frame-hash sets, exact set-Jaccard via
    // the inverted-index join (the frame hash is the token; one equi-join,
    // never all-pairs). Planted variants replace 1 of 10 frames ->
    // Jaccard 9/11 vs base; variant-variant 8/12 stays under the 0.8
    // threshold. The oracle replays frame-id assignment, every frame's
    // pixel closed form, the dHash packing, set-dedup, and the Jaccard. ----
    "x75_video_neardup" -> Q(
      (s, dir) => Multimodal.videoNearDupPairs(s,
          Multimodal.syntheticVideos(
            Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id"),
          threshold = 0.8)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH vids AS (SELECT doc_id AS vid FROM documents WHERE doc_id < 200),
        fids AS (
          SELECT vid, CASE WHEN vid % 4 > 0 AND f = 2*(vid % 4)
                           THEN (vid // 4)*1000 + 400 + 4*(vid % 4)
                           ELSE (vid // 4)*1000 + 4*f END AS fid
          FROM vids, LATERAL (SELECT unnest(range(10)) AS f)),
        params AS (
          SELECT vid, fid, fid % 4 AS v, (fid // 4) % 7 + 1 AS a,
                 (fid // 4) % 11 + 3 AS b, (fid // 4) % 251 AS c, fid // 4 AS grp
          FROM fids),
        bits AS (
          SELECT vid, fid, i,
            CASE WHEN
              (a*((i%8+1)+1)*((i%8+1)+2) + b*((i//8)+1)*((i%8+1)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8+1) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
              >
              (a*((i%8)+1)*((i%8)+2) + b*((i//8)+1)*((i%8)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
            THEN CASE WHEN i = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << cast(i AS INT)) END
            ELSE 0 END AS bit
          FROM params, LATERAL (SELECT unnest(range(64)) AS i)),
        hset AS (SELECT DISTINCT vid, h FROM
          (SELECT vid, fid, cast(sum(bit) AS BIGINT) AS h FROM bits GROUP BY 1, 2)),
        sizes AS (SELECT vid, count(*) AS sz FROM hset GROUP BY 1),
        inter AS (SELECT x.vid AS id_a, y.vid AS id_b, count(*) AS inter
                  FROM hset x JOIN hset y ON x.h = y.h AND x.vid < y.vid GROUP BY 1, 2)
        SELECT id_a, id_b, inter,
               cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
        FROM inter JOIN sizes sa ON id_a = sa.vid JOIN sizes sb ON id_b = sb.vid
        WHERE cast(inter AS DOUBLE) / cast(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8
        ORDER BY id_a, id_b""")),

    // ---- multimodal: REAL video container — the same synthetic corpus
    // as x75 packed as AVI/RIFF files (LIST hdrl -> strl strh/strf fixing
    // the vids stream + its BITMAPINFOHEADER; LIST movi -> 00db chunks of
    // uncompressed DIB bits). The engine walks the RIFF grammar, wraps
    // each DIB frame back into a decodable image, and per-frame dHashes;
    // the oracle replays frame-id assignment + the pixel closed form +
    // the bit packing per (video, frame) — so chunk ORDER and EXTENTS are
    // hash-gated, not just set membership (x75 covers the pair join on
    // top; AVI-walk pair equality is spec-gated in VideoNearDupSpec).
    // MJPG frames ride the JDK JPEG decoder, spec-gated with a Hamming
    // tolerance like every lossy codec. ----
    "x79_avi_frame_hashes" -> Q(
      (s, dir) => Multimodal.videoFrameHashes(s,
          Multimodal.syntheticAviVideos(
            Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH vids AS (SELECT doc_id AS vid FROM documents WHERE doc_id < 200),
        fids AS (
          SELECT vid, f, CASE WHEN vid % 4 > 0 AND f = 2*(vid % 4)
                           THEN (vid // 4)*1000 + 400 + 4*(vid % 4)
                           ELSE (vid // 4)*1000 + 4*f END AS fid
          FROM vids, LATERAL (SELECT unnest(range(10)) AS f)),
        params AS (
          SELECT vid, f, fid, fid % 4 AS v, (fid // 4) % 7 + 1 AS a,
                 (fid // 4) % 11 + 3 AS b, (fid // 4) % 251 AS c, fid // 4 AS grp
          FROM fids),
        bits AS (
          SELECT vid, f, i,
            CASE WHEN
              (a*((i%8+1)+1)*((i%8+1)+2) + b*((i//8)+1)*((i%8+1)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8+1) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
              >
              (a*((i%8)+1)*((i%8)+2) + b*((i//8)+1)*((i%8)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
            THEN CASE WHEN i = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << cast(i AS INT)) END
            ELSE 0 END AS bit
          FROM params, LATERAL (SELECT unnest(range(64)) AS i))
        SELECT vid AS doc_id, cast(f AS INT) AS frame_idx,
               cast(sum(bit) AS BIGINT) AS frame_hash
        FROM bits GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- multimodal: ISO base-media (MP4) video container — the same
    // synthetic corpus as x75/x79 packed as real MP4 files (ftyp + mdat +
    // moov with the full ISO/IEC 14496-12 sample-table chain: stsd fixing
    // the `raw ` 24-bit sample entry, stsz sizes, stsc sample-to-chunk
    // RUNS across a 4/4/2 chunk split, stco absolute chunk offsets). The
    // engine walks the box grammar, resolves every sample's byte range
    // through the chunk tables, rewraps each packed top-down RGB frame as
    // a BMP, and per-frame dHashes; the oracle replays frame-id
    // assignment + the pixel closed form + the bit packing per (video,
    // frame) — sample ORDER, chunk offsets, and extents are all
    // hash-gated. JPEG sample entries ride the JDK decoder, spec-gated
    // with a Hamming tolerance (VideoNearDupSpec); H.264/HEVC stay
    // documented refusals (no JDK codec). ----
    "x82_mp4_frame_hashes" -> Q(
      (s, dir) => Multimodal.videoFrameHashes(s,
          Multimodal.syntheticMp4Videos(
            Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH vids AS (SELECT doc_id AS vid FROM documents WHERE doc_id < 200),
        fids AS (
          SELECT vid, f, CASE WHEN vid % 4 > 0 AND f = 2*(vid % 4)
                           THEN (vid // 4)*1000 + 400 + 4*(vid % 4)
                           ELSE (vid // 4)*1000 + 4*f END AS fid
          FROM vids, LATERAL (SELECT unnest(range(10)) AS f)),
        params AS (
          SELECT vid, f, fid, fid % 4 AS v, (fid // 4) % 7 + 1 AS a,
                 (fid // 4) % 11 + 3 AS b, (fid // 4) % 251 AS c, fid // 4 AS grp
          FROM fids),
        bits AS (
          SELECT vid, f, i,
            CASE WHEN
              (a*((i%8+1)+1)*((i%8+1)+2) + b*((i//8)+1)*((i%8+1)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8+1) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
              >
              (a*((i%8)+1)*((i%8)+2) + b*((i//8)+1)*((i%8)+3) + c*((i//8)+1) + 7*grp
                + CASE WHEN v > 0 AND (i%8) = 2*v AND (i//8) = v THEN 101 ELSE 0 END) % 256
            THEN CASE WHEN i = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << cast(i AS INT)) END
            ELSE 0 END AS bit
          FROM params, LATERAL (SELECT unnest(range(64)) AS i))
        SELECT vid AS doc_id, cast(f AS INT) AS frame_idx,
               cast(sum(bit) AS BIGINT) AS frame_hash
        FROM bits GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- multimodal: compressed-audio HEADER facts — MPEG Layer III and
    // ADTS AAC frame-header walks (published grammars, pure byte math;
    // payload decode has no JDK codec and stays a documented refusal).
    // The corpus alternates MP3 (even ids: rate/bitrate/channel-mode/
    // frame-count/ID3v2-presence all closed forms of the id) and ADTS
    // (odd ids); the oracle replays every parsed field INCLUDING total
    // byte size (frame lengths are bitrate arithmetic), so sync
    // placement, ID3 skipping, and the frame walk are all hash-gated. ----
    "x83_audio_header_facts" -> Q(
      (s, dir) => Multimodal.decode(s,
          Multimodal.syntheticCompressedAudio(
            Tables.documents(s, dir).filter(col("doc_id") < 300), "doc_id"))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("format_guess"),
          col("channels"), col("sample_rate"), col("n_samples"))
        .orderBy(col("doc_id")),
      Some("""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 300),
        mp3 AS (
          SELECT id, id // 2 AS k FROM ids WHERE id % 2 = 0),
        mp3f AS (
          SELECT id,
            CASE k % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS sr,
            CASE 1 + k % 14 WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
              WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96
              WHEN 8 THEN 112 WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
              WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS kbps,
            3 + k % 5 AS frames,
            CASE WHEN id % 4 = 0 THEN 1 ELSE 2 END AS ch,
            CASE WHEN id % 6 = 0 THEN 74 ELSE 0 END AS id3
          FROM mp3),
        aac AS (
          SELECT id, (id - 1) // 2 AS k FROM ids WHERE id % 2 = 1),
        aacf AS (
          SELECT id,
            CASE 4 + k % 8 WHEN 4 THEN 44100 WHEN 5 THEN 32000 WHEN 6 THEN 24000
              WHEN 7 THEN 22050 WHEN 8 THEN 16000 WHEN 9 THEN 12000
              WHEN 10 THEN 11025 ELSE 8000 END AS sr,
            1 + k % 3 AS ch, 2 + k % 6 AS frames, 47 + k % 50 AS flen
          FROM aac),
        unioned AS (
          SELECT id AS doc_id,
            cast(id3 + frames * (144000 * kbps // sr) AS BIGINT) AS n_bytes,
            'mp3' AS format_guess, cast(ch AS INT) AS channels,
            cast(sr AS INT) AS sample_rate,
            cast(frames * 1152 AS BIGINT) AS n_samples
          FROM mp3f
          UNION ALL
          SELECT id, cast(frames * flen AS BIGINT), 'aac-adts',
            cast(ch AS INT), cast(sr AS INT), cast(frames * 1024 AS BIGINT)
          FROM aacf)
        SELECT * FROM unioned ORDER BY doc_id""")),

    // ---- multimodal: COMPRESSED audio — mono IMA-ADPCM (WAV format tag
    // 0x11, the published integer predictor/step-table spec). The engine
    // decodes planted nibble streams (4-byte block header seeding
    // predictor + step index, then ±step-part deltas with int16 / [0,88]
    // clamps) and fingerprints the decoded samples; the oracle replays
    // the ENTIRE decode as a recursive SQL walk over the same step table
    // (one source of truth: the VALUES list is generated from
    // Multimodal.ImaStepTable) and re-derives the 65-window energy-sign
    // fingerprint — a genuine differential test of the codec path.
    // MP3/AAC have no JDK decoder and stay documented refusals. ----
    "x80_adpcm_fingerprint" -> Q(
      (s, dir) => Multimodal.audioFingerprint64(s,
          Multimodal.syntheticAdpcmAudio(
            Tables.documents(s, dir).filter(col("doc_id") < 120), "doc_id"))
        .orderBy(col("id")),
      Some(s"""WITH RECURSIVE params AS (
          SELECT doc_id, doc_id // 4 AS grp, doc_id % 4 AS v,
                 (doc_id // 4) * 2654435761 % 9973 + 17 AS f,
                 (doc_id // 4) % 97 AS c
          FROM documents WHERE doc_id < 120),
        steps(si, sv) AS (VALUES ${Multimodal.ImaStepTable.zipWithIndex
          .map { case (sv, si) => s"($si, $sv)" }.mkString(", ")}),
        dec AS (
          SELECT doc_id, 0 AS t,
                 cast((grp * 2654435761) % 2000 - 1000 AS BIGINT) AS pred,
                 cast((grp * 40503) % 89 AS BIGINT) AS idx
          FROM params
          UNION ALL
          SELECT d.doc_id, d.t + 1,
            greatest(-32768, least(32767, d.pred +
              (CASE WHEN n.nib >= 8 THEN -1 ELSE 1 END) *
              (s.sv // 8 + CASE WHEN n.nib % 2 = 1 THEN s.sv // 4 ELSE 0 END
                         + CASE WHEN (n.nib // 2) % 2 = 1 THEN s.sv // 2 ELSE 0 END
                         + CASE WHEN (n.nib // 4) % 2 = 1 THEN s.sv ELSE 0 END))),
            greatest(0, least(88, d.idx +
              CASE WHEN n.nib % 8 < 4 THEN -1 WHEN n.nib % 8 = 4 THEN 2
                   WHEN n.nib % 8 = 5 THEN 4 WHEN n.nib % 8 = 6 THEN 6 ELSE 8 END))
          FROM dec d
          JOIN params p ON p.doc_id = d.doc_id
          JOIN steps s ON s.si = d.idx
          CROSS JOIN LATERAL (SELECT
            (p.f * (d.t + 1) * (d.t + 3) + p.c * (d.t + 1) + 5 * p.grp
             + CASE WHEN p.v > 0 AND d.t = 40 + 2 * p.v THEN 7 ELSE 0 END) % 16 AS nib) n
          WHERE d.t < 128),
        energies AS (
          SELECT doc_id, (t * 65) // 129 AS wnd, sum(abs(pred)) AS e
          FROM dec GROUP BY 1, 2),
        bits AS (
          SELECT lo.doc_id, lo.wnd AS i,
            CASE WHEN hi.e > lo.e THEN
              CASE WHEN lo.wnd = 63 THEN -9223372036854775807 - 1
                   ELSE (1::BIGINT << cast(lo.wnd AS INT)) END
            ELSE 0 END AS bit
          FROM energies lo JOIN energies hi
            ON lo.doc_id = hi.doc_id AND hi.wnd = lo.wnd + 1
          WHERE lo.wnd < 64)
        SELECT doc_id AS id, cast(sum(bit) AS BIGINT) AS simhash
        FROM bits GROUP BY 1 ORDER BY 1""")),

    // ---- multimodal: frame sampling shape over binary payloads ----
    "x10_frame_sample" -> Q(
      (s, dir) => Multimodal.frameSample(
        Multimodal.attachBinary(Tables.documents(s, dir), "doc_id", "text"),
        strideBytes = 64, maxFrames = 4)
        .select(col("doc_id"), col("frame_idx"),
          octet_length(col("frame_bytes")).as("frame_len"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""SELECT doc_id, cast(f AS INT) AS frame_idx,
          cast(least(64, octet_length(encode(text)) - f * 64) AS INT) AS frame_len
        FROM documents,
          LATERAL (SELECT unnest(range(0, least(4, (octet_length(encode(text)) + 63) // 64))) AS f)
        ORDER BY doc_id, frame_idx"""))
  )
}
