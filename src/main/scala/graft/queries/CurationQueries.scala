package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Decontaminate, Dedup, Sampling, Similarity, TextAnalysis}

/** Round-4 curation operators: benchmark decontamination, cross-document
  * boilerplate scoring, bloom-gated reference dedup, temperature-style
  * group rebalancing, and per-group top-k — the remaining pieces of the
  * training-data-pipeline surface. Every query carries a DuckDB oracle;
  * the bloom query's oracle is the plain anti-join the gadget must equal.
  */
object CurationQueries {

  val qs: Map[String, Q] = Map(

    // ---- benchmark decontamination: train docs sharing any word 4-gram
    // with the benchmark slice (doc_id % 20 == 0), with evidence counts ----
    "x29_decontaminate" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Decontaminate.contaminatedDocs(
          docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L),
          docs.filter(pmod(col("doc_id"), lit(20L)) === 0L),
          "doc_id", "text", n = 4)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3])))) AS ng
          FROM toks),
        bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 20 = 0)
        SELECT doc_id, count(*) AS n_hits
        FROM g JOIN bench USING (ng)
        WHERE doc_id % 20 <> 0
        GROUP BY 1 ORDER BY 1""")),

    // ---- cross-document boilerplate: fraction of a doc's distinct 3-grams
    // appearing in >= 2 documents (C4-style template/chrome signal) ----
    "x30_boilerplate" -> Q(
      (s, dir) => TextAnalysis.boilerplateScore(
        Tables.documents(s, dir), "doc_id", "text", n = 3, minDf = 2L)
        .filter(col("doc_id") < 150)
        .select(col("doc_id"), col("n_ngrams"),
          round(col("boilerplate_frac"), 6).as("boilerplate_frac"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS ng
          FROM toks),
        d AS (SELECT ng, count(*) AS df FROM g GROUP BY 1)
        SELECT doc_id, count(*) AS n_ngrams,
          round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS boilerplate_frac
        FROM g JOIN d USING (ng)
        WHERE doc_id < 150
        GROUP BY 1 ORDER BY 1""")),

    // ---- bloom-gated reference dedup: drop docs whose text appears in the
    // reference slice (doc_id % 7 == 0); the result must EQUAL the plain
    // content anti-join — the oracle gates the bloom gadget end-to-end ----
    "x31_bloom_dedup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.bloomDedupAgainst(docs,
          docs.filter(pmod(col("doc_id"), lit(7L)) === 0L), "doc_id", "text")
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_chars FROM documents
        WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 7 = 0)
        ORDER BY doc_id""")),

    // ---- temperature rebalancing: ceil(sqrt(|lang|) * 4) docs per lang by
    // hash order — the multilingual mixing downsampler, membership exact ----
    "x32_temperature_rebalance" -> Q(
      (s, dir) => Sampling.temperatureRebalance(
        Tables.documents(s, dir), "lang", "doc_id", scale = 4.0)
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
        SELECT doc_id, lang FROM r WHERE rn <= ceil(sqrt(n::DOUBLE) * 4)
        ORDER BY doc_id""")),

    // ---- sequence packing: fixed token-budget bin assignment per source
    // shard in doc_id order (the concatenate-then-chunk pretraining step) ----
    "x34_pack_sequences" -> Q(
      (s, dir) => graft.ops.Sampling.packSequences(
        Tables.documents(s, dir), "source", "doc_id",
        TextAnalysis.wordCount(col("text")), budget = 500L)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("bin_id"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
          SELECT doc_id, source,
            cast(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents)
        SELECT doc_id, source, n_tokens,
          cast(floor(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 500.0) AS BIGINT) AS bin_id
        FROM t ORDER BY doc_id""")),

    // ---- corpus health report: the per-language profile a curation run
    // starts from (counts, token volume, quality, length median, sources) ----
    "x35_corpus_stats" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.wordCount(col("text"))).as("n_tokens"),
          round(avg(TextAnalysis.qualityScore(col("text"))), 4).as("avg_quality"),
          round(expr("percentile(n_chars, 0.5D)"), 6).as("p50_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang")),
      Some("""WITH t AS (
          SELECT doc_id, lang, source, n_chars, text,
            list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ltoks
          FROM documents),
        m AS (SELECT lang, source, n_chars,
            cast(len(toks) AS BIGINT) AS n_words,
            (CASE WHEN length(text) BETWEEN 200 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
             + CASE WHEN cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
             + CASE WHEN cast(len(list_filter(ltoks, x -> x IN ('the','a','an','of','and','to','in','is','it','that'))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality
          FROM t)
        SELECT lang, count(*) AS n_docs, cast(sum(n_words) AS BIGINT) AS n_tokens,
          round(avg(quality), 4) AS avg_quality,
          round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
          count(DISTINCT source) AS n_sources
        FROM m GROUP BY 1 ORDER BY 1""")),

    // ---- most common word 3-grams corpus-wide (by document frequency) —
    // the report a boilerplate blocklist is seeded from; df counted on
    // 8-byte hash keys, surface strings recovered in a narrow second pass ----
    "x36_common_ngrams" -> Q(
      (s, dir) => TextAnalysis.topNgramsByDf(
        Tables.documents(s, dir), "text", n = 3, k = 20),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS ng
          FROM toks)
        SELECT ng, count(*) AS df FROM g
        GROUP BY 1 ORDER BY df DESC, ng ASC LIMIT 20""")),

    // ---- cross-source leakage: distinct shared word 4-grams per source
    // pair — which feeds republish which, before mixture weights are set ----
    "x38_source_overlap" -> Q(
      (s, dir) => TextAnalysis.sourceNgramOverlap(
          Tables.documents(s, dir), "source", "text", n = 4)
        .orderBy(col("src_a"), col("src_b")),
      Some("""WITH toks AS (
          SELECT source, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (SELECT DISTINCT source, ng FROM (
          SELECT source, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3])))) AS ng
          FROM toks))
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_ngrams
        FROM g a JOIN g b ON a.ng = b.ng AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- embedding-space QA: per-label vector counts and norm profile
    // (degenerate/zero/outlier vectors surface here before ANN runs) ----
    "x39_embedding_qa" -> Q(
      (s, dir) => Tables.embeddings(s, dir)
        .select(col("label"),
          sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, x) => a + x)).as("__norm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("__norm")), 4).as("avg_norm"),
          round(min(col("__norm")), 6).as("min_norm"),
          round(max(col("__norm")), 6).as("max_norm"))
        .orderBy(col("label")),
      Some("""WITH v AS (
          SELECT label,
            sqrt(list_sum(list_transform(embedding,
              x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)))) AS nrm
          FROM embeddings)
        SELECT label, count(*) AS n_vecs,
          round(avg(nrm), 4) AS avg_norm,
          round(min(nrm), 6) AS min_norm,
          round(max(nrm), 6) AS max_norm
        FROM v GROUP BY 1 ORDER BY 1""")),

    // ---- nearest-class-mean classification: confusion matrix against the
    // labels — the embedding-space separability health check; centroids are
    // rounded to 4dp so assignment is engine-portable (min argmax margin on
    // this data ~1e-5, float noise ~1e-15) ----
    "x40_class_confusion" -> Q(
      (s, dir) => Similarity.nearestClassMean(
          Tables.embeddings(s, dir), "embedding", "label")
        .orderBy(col("true_label"), col("assigned_label")),
      Some("""WITH v AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> cast(x AS DOUBLE)) AS vec
          FROM embeddings),
        d AS (
          SELECT label, i AS dim, vec[i] AS val
          FROM v, unnest(range(1, len(vec) + 1)) AS r(i)),
        c AS (SELECT label AS clabel, dim, round(avg(val), 4) AS cv
          FROM d GROUP BY 1, 2),
        cent AS (SELECT clabel, list(cv ORDER BY dim) AS centroid
          FROM c GROUP BY 1),
        scored AS (
          SELECT v.vec_id, v.label AS true_label, cent.clabel,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent),
        best AS (
          SELECT true_label, clabel AS assigned_label FROM (
            SELECT true_label, clabel,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel ASC) AS rn
            FROM scored) WHERE rn = 1)
        SELECT true_label, assigned_label, count(*) AS n
        FROM best GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- one Lloyd iteration of spherical k-means seeded from the class
    // prototypes, reported as the label × refined-cluster contingency —
    // rounded centroid updates make the iteration replayable in SQL ----
    "x41_kmeans_refine" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val init = Similarity.classCentroids(e, "embedding", "label")
          .orderBy(col("label")).collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1)))
        Similarity.kmeansAssign(e, "embedding", init, iters = 1)
          .groupBy(col("label"), col("cluster"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("label"), col("cluster"))
      },
      Some("""WITH v AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> cast(x AS DOUBLE)) AS vec
          FROM embeddings),
        d0 AS (SELECT label, i AS dim, vec[i] AS val
          FROM v, unnest(range(1, len(vec) + 1)) AS r(i)),
        c0 AS (SELECT label AS cl, dim, round(avg(val), 4) AS cv
          FROM d0 GROUP BY 1, 2),
        cent0 AS (SELECT cl, list(cv ORDER BY dim) AS centroid
          FROM c0 GROUP BY 1),
        s0 AS (SELECT v.vec_id, v.label, v.vec, cent0.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent0.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent0.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent0),
        a0 AS (SELECT vec_id, label, vec, cl AS cluster FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s0) WHERE rn = 1),
        d1 AS (SELECT cluster, i AS dim, vec[i] AS val
          FROM a0, unnest(range(1, len(vec) + 1)) AS r(i)),
        c1 AS (SELECT cluster AS cl, dim, round(avg(val), 4) AS cv
          FROM d1 GROUP BY 1, 2),
        cent1 AS (SELECT cl, list(cv ORDER BY dim) AS centroid
          FROM c1 GROUP BY 1),
        s1 AS (SELECT v.vec_id, v.label, cent1.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent1.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent1.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent1),
        a1 AS (SELECT vec_id, label, cl AS cluster FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s1) WHERE rn = 1)
        SELECT label, cluster, count(*) AS n
        FROM a1 GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- fuzzy reference decontamination: drop train docs near-duplicate
    // (exact Jaccard >= 0.8) of ANY benchmark-slice doc. MinHash-LSH
    // proposes cross-corpus candidates, exact Jaccard disposes; the oracle
    // is the exact all-pairs gate, so equality verifies band recall. ----
    "x48_fuzzy_decontaminate" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.minhashDedupAgainst(
          docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L),
          docs.filter(pmod(col("doc_id"), lit(20L)) === 0L),
          "doc_id", "text", threshold = 0.8)
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id AS id, unnest(list_distinct(
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS tok
          FROM documents),
        sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY 1),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
          FROM toks a JOIN toks b ON a.tok = b.tok
          WHERE a.id % 20 <> 0 AND b.id % 20 = 0
          GROUP BY 1, 2),
        dirty AS (
          SELECT DISTINCT id_a AS doc_id FROM inter
          JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
          WHERE cast(i AS DOUBLE) / cast(sa.sz + sb.sz - i AS DOUBLE) >= 0.8)
        SELECT d.doc_id, d.lang, d.source
        FROM documents d
        WHERE d.doc_id % 20 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
        ORDER BY d.doc_id""")),

    // ---- SemDeDup: cluster the embedding space (label-prototype seeding),
    // within each cluster link pairs with cosine >= 0.36 as semantic dups,
    // keep the smallest id of each connected dup group. Oracle replays the
    // full chain: rounded centroids -> NCM assignment -> within-cluster
    // pair cut on the ROUNDED cosine -> recursive transitive closure. ----
    "x47_semantic_dedup" -> Q(
      (s, dir) => Similarity.semanticDedup(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label",
        threshold = 0.36)
        .select(col("id").as("vec_id"), col("cluster"),
          col("keep").cast("int").as("keep"))
        .orderBy(col("vec_id")),
      Some("""WITH RECURSIVE
        v AS (SELECT vec_id, label,
            list_transform(embedding, x -> cast(x AS DOUBLE)) AS vec
          FROM embeddings),
        d AS (SELECT label, i AS dim, vec[i] AS val
          FROM v, unnest(range(1, len(vec) + 1)) AS r(i)),
        c AS (SELECT label AS cl, dim, round(avg(val), 4) AS cv
          FROM d GROUP BY 1, 2),
        cent AS (SELECT cl, list(cv ORDER BY dim) AS centroid FROM c GROUP BY 1),
        s AS (SELECT v.vec_id, cent.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent),
        a AS (SELECT vec_id, cl AS cluster FROM (
            SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s) WHERE rn = 1),
        pairs AS (
          SELECT x.vec_id AS id_a, y.vec_id AS id_b
          FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
          JOIN v va ON va.vec_id = x.vec_id JOIN v vb ON vb.vec_id = y.vec_id
          WHERE round(
            list_sum(list_transform(range(1, len(va.vec) + 1), i -> va.vec[i] * vb.vec[i]))
            / (sqrt(list_sum(list_transform(va.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(vb.vec, x -> x * x)))), 6) >= 0.36),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS vec_id, least(src, min(dst)) AS comp_id
                 FROM reach GROUP BY src)
        SELECT a.vec_id, a.cluster,
          CAST(comp.comp_id IS NULL OR comp.comp_id = a.vec_id AS INT) AS keep
        FROM a LEFT JOIN comp USING (vec_id) ORDER BY a.vec_id""")),

    // ---- SemDeDup, unlabeled auto-k form (the 100 TB shape): k =
    // max(2, ceil(N/16)) strided deterministic seeds (vec_id % 11, rounded
    // 4dp), ONE Lloyd refinement, then the same within-cluster pair cut /
    // transitive closure / keep-smallest-id as x47. k >> label count (32 at
    // sf0.01 vs 5 labels), so this gates the scale path where cluster count
    // grows with the corpus. Oracle replays the ENTIRE chain: seed codebook
    // -> argmax assignment -> rounded centroid update -> reassignment ->
    // rounded-cosine pair cut -> recursive transitive closure. ----
    "x50_semantic_auto" -> Q(
      (s, dir) => Similarity.semanticDedupAuto(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        targetClusterSize = 16, threshold = 0.36)
        .select(col("id").as("vec_id"), col("cluster"),
          col("keep").cast("int").as("keep"))
        .orderBy(col("vec_id")),
      Some("""WITH RECURSIVE
        v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS DOUBLE)) AS vec
          FROM embeddings),
        kk AS (SELECT greatest(2, cast(ceil(count(*) / 16.0) AS BIGINT)) AS k FROM v),
        sd AS (SELECT vec_id, list_transform(vec, x -> round(x, 4)) AS svec,
            row_number() OVER (ORDER BY vec_id) AS srn
          FROM v WHERE vec_id % 11 = 0),
        cent0 AS (SELECT cast(srn - 1 AS INT) AS cl, svec AS centroid FROM sd
          WHERE srn <= (SELECT k FROM kk)),
        s0 AS (SELECT v.vec_id, v.vec, cent0.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent0.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent0.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent0),
        a0 AS (SELECT vec_id, vec, cl AS cluster FROM (
            SELECT vec_id, vec, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s0) WHERE rn = 1),
        d1 AS (SELECT cluster, i AS dim, vec[i] AS val
          FROM a0, unnest(range(1, len(vec) + 1)) AS r(i)),
        c1 AS (SELECT cluster AS cl, dim, round(avg(val), 4) AS cv
          FROM d1 GROUP BY 1, 2),
        cent1 AS (SELECT cl, list(cv ORDER BY dim) AS centroid FROM c1 GROUP BY 1),
        s1 AS (SELECT v.vec_id, cent1.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent1.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent1.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent1),
        a1 AS (SELECT vec_id, cl AS cluster FROM (
            SELECT vec_id, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s1) WHERE rn = 1),
        pairs AS (
          SELECT x.vec_id AS id_a, y.vec_id AS id_b
          FROM a1 x JOIN a1 y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
          JOIN v va ON va.vec_id = x.vec_id JOIN v vb ON vb.vec_id = y.vec_id
          WHERE round(
            list_sum(list_transform(range(1, len(va.vec) + 1), i -> va.vec[i] * vb.vec[i]))
            / (sqrt(list_sum(list_transform(va.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(vb.vec, x -> x * x)))), 6) >= 0.36),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS vec_id, least(src, min(dst)) AS comp_id
                 FROM reach GROUP BY src)
        SELECT a1.vec_id, a1.cluster,
          CAST(comp.comp_id IS NULL OR comp.comp_id = a1.vec_id AS INT) AS keep
        FROM a1 LEFT JOIN comp USING (vec_id) ORDER BY a1.vec_id""")),

    // ---- within-document duplicated-span removal (Lee et al. exact
    // substring dedup at 5-token-window granularity): first global
    // occurrence survives, documents reassembled from surviving spans ----
    "x37_span_dedup" -> Q(
      (s, dir) => Dedup.spanDedup(Tables.documents(s, dir),
          "doc_id", "text", w = 5)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        ch AS (
          SELECT doc_id, i AS pos, array_to_string(toks[i*5+1:i*5+5], ' ') AS chunk
          FROM toks, unnest(range(0, cast(ceil(len(toks)/5.0) AS BIGINT))) AS r(i)),
        k AS (SELECT doc_id, pos, chunk,
            row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
          FROM ch),
        agg AS (
          SELECT doc_id, count(*) AS n_chunks,
            cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '') AS clean_text
          FROM k GROUP BY 1)
        SELECT d.doc_id, cast(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
          cast(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
          coalesce(a.clean_text, '') AS clean_text
        FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY 1""")),

    // ---- surgical decontamination: strip 3-token spans appearing in the
    // benchmark slice from training docs (keep the novel remainder) ----
    "x43_span_decontaminate" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.spanDedupAgainst(
          docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L),
          docs.filter(pmod(col("doc_id"), lit(20L)) === 0L),
          "doc_id", "text", w = 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        ch AS (
          SELECT doc_id, i AS pos, array_to_string(toks[i*3+1:i*3+3], ' ') AS chunk
          FROM toks, unnest(range(0, cast(ceil(len(toks)/3.0) AS BIGINT))) AS r(i)),
        ref AS (
          SELECT DISTINCT array_to_string(toks[i:i+g-1], ' ') AS chunk
          FROM toks,
               unnest(range(1, 4)) AS gs(g),
               unnest(range(1, greatest(len(toks) - g + 2, 1))) AS rs(i)
          WHERE doc_id % 20 = 0),
        tr AS (
          SELECT ch.doc_id, ch.pos, ch.chunk, (ref.chunk IS NOT NULL) AS hit
          FROM ch LEFT JOIN ref ON ch.chunk = ref.chunk
          WHERE ch.doc_id % 20 <> 0),
        agg AS (
          SELECT doc_id, count(*) AS n_chunks,
            cast(sum(CASE WHEN NOT hit THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            coalesce(string_agg(CASE WHEN NOT hit THEN chunk END, ' ' ORDER BY pos), '') AS clean_text
          FROM tr GROUP BY 1)
        SELECT d.doc_id, cast(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
          cast(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
          coalesce(a.clean_text, '') AS clean_text
        FROM documents d LEFT JOIN agg a USING (doc_id)
        WHERE d.doc_id % 20 <> 0 ORDER BY 1""")),

    // ---- curation pipeline v2 (capstone over the round-4 operators):
    // span dedup -> quality gate on the cleaned text -> decontamination
    // against the benchmark slice, reporting surviving docs + token counts ----
    "x42_pipeline_v2" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cleaned = Dedup.spanDedup(docs, "doc_id", "text", w = 5)
          .filter(col("n_kept") > 0)
          .select(col("doc_id"), col("clean_text").as("text"))
        // snapshot the span-dedup chain: removeContaminated scans its train
        // side twice (n-gram probe + anti-join), re-running the window
        // shuffle without this
        val qualified = cleaned
          .filter(TextAnalysis.qualityScore(col("text")) >= 0.7)
          .localCheckpoint(true)
        val bench = docs.filter(pmod(col("doc_id"), lit(20L)) === 0L)
        Decontaminate.removeContaminated(qualified, bench, "doc_id", "text", n = 4)
          .select(col("doc_id"), TextAnalysis.wordCount(col("text")).as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        ch AS (
          SELECT doc_id, i AS pos, array_to_string(toks[i*5+1:i*5+5], ' ') AS chunk
          FROM toks, unnest(range(0, cast(ceil(len(toks)/5.0) AS BIGINT))) AS r(i)),
        k AS (SELECT doc_id, pos, chunk,
            row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
          FROM ch),
        clean AS (
          SELECT doc_id,
            coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '') AS text,
            sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept
          FROM k GROUP BY 1),
        q AS (
          SELECT doc_id, text,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS qtoks
          FROM clean WHERE n_kept > 0 AND (
            CASE WHEN length(text) BETWEEN 200 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
            + CASE WHEN cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1) <= 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
            + CASE WHEN cast(len(list_filter(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
                       x -> x IN ('the','a','an','of','and','to','in','is','it','that'))) AS DOUBLE)
                     / greatest(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')), 1) >= 0.01
              THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) >= 0.7),
        qg AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(qtoks) - 2),
            i -> concat_ws(' ', qtoks[i], qtoks[i+1], qtoks[i+2], qtoks[i+3])))) AS ng
          FROM q),
        bg AS (
          SELECT DISTINCT ng FROM (
            SELECT unnest(list_distinct(list_transform(range(1, len(toks) - 2),
              i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3])))) AS ng
            FROM toks WHERE doc_id % 20 = 0)),
        dirty AS (SELECT DISTINCT qg.doc_id FROM qg JOIN bg USING (ng))
        SELECT q.doc_id,
          cast(len(list_filter(string_split_regex(q.text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM q LEFT JOIN dirty ON q.doc_id = dirty.doc_id
        WHERE dirty.doc_id IS NULL
        ORDER BY 1""")),

    // ---- curation pipeline v3 (capstone over the FULL dedup surface):
    // span dedup -> quality gate -> exact 4-gram decontamination -> FUZZY
    // reference decontamination (x48's banded minhash propose / exact
    // Jaccard dispose, on the CLEANED text vs the benchmark originals) ->
    // SEMANTIC dedup (x50's unlabeled auto-k SemDeDup verdicts over the
    // embedding table; docs without an embedding pass). One SQL-replayed
    // chain demonstrating the whole surface composes. ----
    "x49_pipeline_v3" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val bench = docs.filter(pmod(col("doc_id"), lit(20L)) === 0L)
        // The semantic verdicts (embedding table) and the text chain
        // (documents table) are INDEPENDENT DAG branches, but both are built
        // from eager materializations (localCheckpoints, seed collects, CC
        // rounds) that would otherwise serialize in the driver. Submitting
        // the semantic branch from a second thread overlaps the two — the
        // same concurrent-job-group pattern a cluster deployment uses to
        // keep executors busy across independent stages. Result-identical:
        // both branches are deterministic and meet only in the final
        // anti-join (measured 9.1 s -> ~5.5 s idle at sf0.1).
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        // semantic verdicts are a GLOBAL embedding-space analysis (computed
        // on the full vector table, not the filtered survivors) — a doc
        // dropped here is a semantic copy of a kept smaller-id doc
        val semDropF = Future {
          Similarity.semanticDedupAuto(
            Tables.embeddings(s, dir), "vec_id", "embedding",
            targetClusterSize = 16, threshold = 0.36)
            .filter(!col("keep"))
            .select(col("id").as("doc_id"))
            .localCheckpoint(true)   // a bounded id list; forces the branch
        }
        val cleaned = Dedup.spanDedup(docs, "doc_id", "text", w = 5)
          .filter(col("n_kept") > 0)
          .select(col("doc_id"), col("clean_text").as("text"))
        // materialize the span-dedup chain ONCE: removeContaminated scans
        // its train side twice (n-gram probe + anti-join) and
        // minhashDedupAgainst scans its corpus three times (signatures,
        // exact-Jaccard rescore, anti-join) — without these snapshots the
        // spanDedup window shuffle re-executes ~5x
        val qualified = cleaned
          .filter(TextAnalysis.qualityScore(col("text")) >= 0.7)
          .localCheckpoint(true)
        val exactClean = Decontaminate.removeContaminated(
          qualified, bench, "doc_id", "text", n = 4)
          .localCheckpoint(true)
        val fuzzyClean = Dedup.minhashDedupAgainst(
          exactClean, bench, "doc_id", "text", threshold = 0.8)
        val semDrop = Await.result(semDropF,
          scala.concurrent.duration.Duration.Inf)
        fuzzyClean.join(semDrop, Seq("doc_id"), "left_anti")
          .select(col("doc_id"),
            TextAnalysis.wordCount(col("text")).as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        ch AS (
          SELECT doc_id, i AS pos, array_to_string(toks[i*5+1:i*5+5], ' ') AS chunk
          FROM toks, unnest(range(0, cast(ceil(len(toks)/5.0) AS BIGINT))) AS r(i)),
        k AS (SELECT doc_id, pos, chunk,
            row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
          FROM ch),
        clean AS (
          SELECT doc_id,
            coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '') AS text,
            sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept
          FROM k GROUP BY 1),
        q AS (
          SELECT doc_id, text,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS qtoks
          FROM clean WHERE n_kept > 0 AND (
            CASE WHEN length(text) BETWEEN 200 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
            + CASE WHEN cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1) <= 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
            + CASE WHEN cast(len(list_filter(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
                       x -> x IN ('the','a','an','of','and','to','in','is','it','that'))) AS DOUBLE)
                     / greatest(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')), 1) >= 0.01
              THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) >= 0.7),
        qg AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(qtoks) - 2),
            i -> concat_ws(' ', qtoks[i], qtoks[i+1], qtoks[i+2], qtoks[i+3])))) AS ng
          FROM q),
        bg AS (
          SELECT DISTINCT ng FROM (
            SELECT unnest(list_distinct(list_transform(range(1, len(toks) - 2),
              i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3])))) AS ng
            FROM toks WHERE doc_id % 20 = 0)),
        dirty AS (SELECT DISTINCT qg.doc_id FROM qg JOIN bg USING (ng)),
        surv AS (
          SELECT q.doc_id, q.text FROM q LEFT JOIN dirty ON q.doc_id = dirty.doc_id
          WHERE dirty.doc_id IS NULL),
        ttoks AS (SELECT doc_id AS id, unnest(list_distinct(
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS tok
          FROM surv),
        rtoks AS (SELECT doc_id AS id, unnest(list_distinct(
            list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS tok
          FROM documents WHERE doc_id % 20 = 0),
        tsz AS (SELECT id, count(*) AS sz FROM ttoks GROUP BY 1),
        rsz AS (SELECT id, count(*) AS sz FROM rtoks GROUP BY 1),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
          FROM ttoks a JOIN rtoks b ON a.tok = b.tok GROUP BY 1, 2),
        fdirty AS (
          SELECT DISTINCT id_a AS doc_id FROM inter
          JOIN tsz ON tsz.id = id_a JOIN rsz ON rsz.id = id_b
          WHERE cast(i AS DOUBLE) / cast(tsz.sz + rsz.sz - i AS DOUBLE) >= 0.8),
        v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS DOUBLE)) AS vec
          FROM embeddings),
        kk AS (SELECT greatest(2, cast(ceil(count(*) / 16.0) AS BIGINT)) AS k FROM v),
        sdv AS (SELECT vec_id, list_transform(vec, x -> round(x, 4)) AS svec,
            row_number() OVER (ORDER BY vec_id) AS srn
          FROM v WHERE vec_id % 11 = 0),
        cent0 AS (SELECT cast(srn - 1 AS INT) AS cl, svec AS centroid FROM sdv
          WHERE srn <= (SELECT k FROM kk)),
        s0 AS (SELECT v.vec_id, v.vec, cent0.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent0.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent0.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent0),
        a0 AS (SELECT vec_id, vec, cl AS cluster FROM (
            SELECT vec_id, vec, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s0) WHERE rn = 1),
        d1 AS (SELECT cluster, i AS dim, vec[i] AS val
          FROM a0, unnest(range(1, len(vec) + 1)) AS r(i)),
        c1 AS (SELECT cluster AS cl, dim, round(avg(val), 4) AS cv
          FROM d1 GROUP BY 1, 2),
        cent1 AS (SELECT cl, list(cv ORDER BY dim) AS centroid FROM c1 GROUP BY 1),
        s1 AS (SELECT v.vec_id, cent1.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent1.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent1.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent1),
        a1 AS (SELECT vec_id, cl AS cluster FROM (
            SELECT vec_id, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s1) WHERE rn = 1),
        sp AS (
          SELECT x.vec_id AS id_a, y.vec_id AS id_b
          FROM a1 x JOIN a1 y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
          JOIN v va ON va.vec_id = x.vec_id JOIN v vb ON vb.vec_id = y.vec_id
          WHERE round(
            list_sum(list_transform(range(1, len(va.vec) + 1), i -> va.vec[i] * vb.vec[i]))
            / (sqrt(list_sum(list_transform(va.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(vb.vec, x -> x * x)))), 6) >= 0.36),
        edges AS (SELECT id_a AS src, id_b AS dst FROM sp
                  UNION SELECT id_b, id_a FROM sp),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS vec_id, least(src, min(dst)) AS comp_id
                 FROM reach GROUP BY src),
        sdrop AS (SELECT vec_id AS doc_id FROM comp WHERE comp_id <> vec_id)
        SELECT s.doc_id,
          cast(len(list_filter(string_split_regex(s.text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM surv s
        LEFT JOIN fdirty fd ON s.doc_id = fd.doc_id
        LEFT JOIN sdrop sd ON s.doc_id = sd.doc_id
        WHERE fd.doc_id IS NULL AND sd.doc_id IS NULL
        ORDER BY 1""")),

    // ---- per-group top-k: 5 longest docs per language (deterministic
    // tie-break on doc_id); WindowGroupLimit keeps it partial-top-k ----
    "x33_topk_per_group" -> Q(
      (s, dir) => Sampling.topKPerGroup(
        Tables.documents(s, dir), "lang", k = 5,
        order = Seq(col("n_chars").desc, col("doc_id").asc))
        .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("rank")),
      Some("""SELECT lang, cast(rank AS INT) AS rank, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars,
            row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rank
          FROM documents)
        WHERE rank <= 5 ORDER BY lang, rank""")),

    // ---- int8 scalar-quantized ANN (SQ8 — the per-dimension memory-cut
    // path next to x46's PQ): the oracle replays quantize → pure-integer
    // code cosine shortlist → exact re-rank, value-exactly — the scales
    // cancel out of the code cosine, so ranking is exact integer sums
    // through correctly-rounded sqrt on both engines ----
    "x51_ann_int8" -> Q(
      (s, dir) => Similarity.int8TopK(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5, shortlist = 64)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        enc AS (
          SELECT vec_id, v,
            (SELECT max(abs(x)) FROM unnest(v) AS t(x)) / 127.0 AS scale
          FROM v),
        codes AS (
          SELECT vec_id, v,
            CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) END AS c
          FROM enc),
        n2 AS (
          SELECT vec_id, v, c, (SELECT sum(x * x) FROM unnest(c) AS t(x)) AS n2
          FROM codes),
        scored AS (
          SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
            (SELECT sum(z.a * z.b)
             FROM (SELECT unnest(q.c) AS a, unnest(d.c) AS b) z) AS dot,
            q.n2 AS qn2, d.n2 AS dn2
          FROM n2 q, n2 d
          WHERE q.vec_id IN (0, 1, 2, 3, 4) AND d.vec_id <> q.vec_id),
        appr AS (
          SELECT query_id, neighbor_id,
            CASE WHEN qn2 = 0 OR dn2 = 0 THEN 0.0
                 ELSE dot::DOUBLE / (sqrt(qn2::DOUBLE) * sqrt(dn2::DOUBLE)) END AS approx
          FROM scored),
        short AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY approx DESC, neighbor_id ASC) AS srk
          FROM appr),
        rer AS (
          SELECT s.query_id, s.neighbor_id, coalesce(x.c, -2.0) AS cos
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

    // ---- content-defined chunk dedup (gear-style CDC at token
    // granularity): boundaries from a portable char-fold hash, chunks
    // dedup corpus-wide by first occurrence; the oracle recomputes the
    // chunking and winners on chunk STRINGS, so an xxhash64 collision on
    // the Spark side would surface as a mismatch ----
    "x52_cdc_chunks" -> Q(
      (s, dir) => Dedup.cdcChunkDedup(
        Tables.documents(s, dir), "doc_id", "text", avgChunk = 8)
        .orderBy(col("doc_id")),
      Some("""WITH toks0 AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
          FROM documents),
        toks AS (
          SELECT doc_id, i - 1 AS pos, tk[i] AS tok
          FROM toks0, unnest(range(1, len(tk) + 1)) AS r(i)),
        hashed AS (
          SELECT doc_id, pos, tok,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(tok, ''), ch -> CAST(ascii(ch) AS BIGINT))),
              (h, c) -> (h * 31 + c) % 1000000007) AS h
          FROM toks),
        chunked AS (
          SELECT doc_id, pos, tok,
            coalesce(sum(CASE WHEN h % 8 = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
          FROM hashed),
        chunks AS (
          SELECT doc_id, chunk_id, count(*) AS n_toks,
            string_agg(tok, ' ' ORDER BY pos) AS chunk
          FROM chunked GROUP BY 1, 2),
        winners AS (
          SELECT chunk, min(struct_pack(doc_id := doc_id, chunk_id := chunk_id)) AS w
          FROM chunks GROUP BY 1),
        perdoc AS (
          SELECT c.doc_id,
            count(*) AS n_chunks,
            sum(CASE WHEN w.w.doc_id = c.doc_id AND w.w.chunk_id = c.chunk_id
                THEN 1 ELSE 0 END) AS n_uniq_chunks,
            sum(CASE WHEN w.w.doc_id = c.doc_id AND w.w.chunk_id = c.chunk_id
                THEN 0 ELSE c.n_toks END) AS n_dup_tokens
          FROM chunks c JOIN winners w ON c.chunk = w.chunk
          GROUP BY 1)
        SELECT d.doc_id,
          CAST(coalesce(p.n_chunks, 0) AS BIGINT) AS n_chunks,
          CAST(coalesce(p.n_uniq_chunks, 0) AS BIGINT) AS n_uniq_chunks,
          CAST(coalesce(p.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens
        FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
        ORDER BY d.doc_id""")),

    // ---- prototypicality pruning (Sorscher et al. 2022): auto-k cluster,
    // score by cosine to the own-cluster mean, keep the hardest keepFrac
    // of each cluster; the oracle replays seeds → Lloyd step → assignment
    // → rounded centroids → prototype cosines → per-cluster rank cut ----
    "x54_prototype_prune" -> Q(
      (s, dir) => Similarity.prototypePrune(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        targetClusterSize = 16, keepFrac = 0.5)
        .select(col("id").as("vec_id"), col("cluster"), col("proto_cos"),
          col("keep").cast("int").as("keep"))
        .orderBy(col("vec_id")),
      Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS DOUBLE)) AS vec
          FROM embeddings),
        kk AS (SELECT greatest(2, cast(ceil(count(*) / 16.0) AS BIGINT)) AS k FROM v),
        sd AS (SELECT vec_id, list_transform(vec, x -> round(x, 4)) AS svec,
            row_number() OVER (ORDER BY vec_id) AS srn
          FROM v WHERE vec_id % 11 = 0),
        cent0 AS (SELECT cast(srn - 1 AS INT) AS cl, svec AS centroid FROM sd
          WHERE srn <= (SELECT k FROM kk)),
        s0 AS (SELECT v.vec_id, v.vec, cent0.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent0.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent0.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent0),
        a0 AS (SELECT vec_id, vec, cl AS cluster FROM (
            SELECT vec_id, vec, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s0) WHERE rn = 1),
        d1 AS (SELECT cluster, i AS dim, vec[i] AS val
          FROM a0, unnest(range(1, len(vec) + 1)) AS r(i)),
        c1 AS (SELECT cluster AS cl, dim, round(avg(val), 4) AS cv
          FROM d1 GROUP BY 1, 2),
        cent1 AS (SELECT cl, list(cv ORDER BY dim) AS centroid FROM c1 GROUP BY 1),
        s1 AS (SELECT v.vec_id, v.vec, cent1.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent1.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent1.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent1),
        a1 AS (SELECT vec_id, vec, cl AS cluster FROM (
            SELECT vec_id, vec, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s1) WHERE rn = 1),
        d2 AS (SELECT cluster, i AS dim, vec[i] AS val
          FROM a1, unnest(range(1, len(vec) + 1)) AS r(i)),
        c2 AS (SELECT cluster, dim, round(avg(val), 4) AS cv
          FROM d2 GROUP BY 1, 2),
        cent2 AS (SELECT cluster, list(cv ORDER BY dim) AS centroid FROM c2 GROUP BY 1),
        pc AS (SELECT a1.vec_id, a1.cluster,
            round(list_sum(list_transform(range(1, len(a1.vec) + 1),
              i -> a1.vec[i] * cent2.centroid[i]))
            / (sqrt(list_sum(list_transform(a1.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent2.centroid, x -> x * x)))), 6) AS proto_cos
          FROM a1 JOIN cent2 USING (cluster)),
        r AS (SELECT vec_id, cluster, proto_cos,
            row_number() OVER (PARTITION BY cluster ORDER BY proto_cos ASC, vec_id ASC) AS rn,
            count(*) OVER (PARTITION BY cluster) AS n
          FROM pc)
        SELECT vec_id, cluster, proto_cos,
          CAST(rn <= ceil(0.5 * n::DOUBLE) AS INT) AS keep
        FROM r ORDER BY vec_id""")),

    // ---- curation pipeline v4 (prune-then-mix): embedding-space
    // prototypicality pruning decides which docs survive (docs without an
    // embedding pass through, like x49), then the token-budget mixture is
    // built over the SURVIVORS — the pretraining-prep flow the round-6
    // operators compose into; the oracle replays the entire chain ----
    "x55_prune_mix" -> Q(
      (s, dir) => {
        val drop = Similarity.prototypePrune(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          targetClusterSize = 16, keepFrac = 0.5)
          .filter(!col("keep")).select(col("id").as("doc_id"))
        val survivors = Tables.documents(s, dir).join(drop, Seq("doc_id"), "left_anti")
        Sampling.budgetMix(survivors, "source", "doc_id",
          TextAnalysis.wordCount(col("text")), budget = 8000L)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("cap"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS DOUBLE)) AS vec
          FROM embeddings),
        kk AS (SELECT greatest(2, cast(ceil(count(*) / 16.0) AS BIGINT)) AS k FROM v),
        sd AS (SELECT vec_id, list_transform(vec, x -> round(x, 4)) AS svec,
            row_number() OVER (ORDER BY vec_id) AS srn
          FROM v WHERE vec_id % 11 = 0),
        cent0 AS (SELECT cast(srn - 1 AS INT) AS cl, svec AS centroid FROM sd
          WHERE srn <= (SELECT k FROM kk)),
        s0 AS (SELECT v.vec_id, v.vec, cent0.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent0.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent0.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent0),
        a0 AS (SELECT vec_id, vec, cl AS cluster FROM (
            SELECT vec_id, vec, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s0) WHERE rn = 1),
        d1 AS (SELECT cluster, i AS dim, vec[i] AS val
          FROM a0, unnest(range(1, len(vec) + 1)) AS r(i)),
        c1 AS (SELECT cluster AS cl, dim, round(avg(val), 4) AS cv
          FROM d1 GROUP BY 1, 2),
        cent1 AS (SELECT cl, list(cv ORDER BY dim) AS centroid FROM c1 GROUP BY 1),
        s1 AS (SELECT v.vec_id, v.vec, cent1.cl,
            list_sum(list_transform(range(1, len(v.vec) + 1),
              i -> v.vec[i] * cent1.centroid[i]))
            / (sqrt(list_sum(list_transform(v.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent1.centroid, x -> x * x)))) AS cos
          FROM v CROSS JOIN cent1),
        a1 AS (SELECT vec_id, vec, cl AS cluster FROM (
            SELECT vec_id, vec, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl ASC) AS rn
            FROM s1) WHERE rn = 1),
        d2 AS (SELECT cluster, i AS dim, vec[i] AS val
          FROM a1, unnest(range(1, len(vec) + 1)) AS r(i)),
        c2 AS (SELECT cluster, dim, round(avg(val), 4) AS cv
          FROM d2 GROUP BY 1, 2),
        cent2 AS (SELECT cluster, list(cv ORDER BY dim) AS centroid FROM c2 GROUP BY 1),
        pc AS (SELECT a1.vec_id, a1.cluster,
            round(list_sum(list_transform(range(1, len(a1.vec) + 1),
              i -> a1.vec[i] * cent2.centroid[i]))
            / (sqrt(list_sum(list_transform(a1.vec, x -> x * x)))
             * sqrt(list_sum(list_transform(cent2.centroid, x -> x * x)))), 6) AS proto_cos
          FROM a1 JOIN cent2 USING (cluster)),
        pr AS (SELECT vec_id, cluster, proto_cos,
            row_number() OVER (PARTITION BY cluster ORDER BY proto_cos ASC, vec_id ASC) AS rn,
            count(*) OVER (PARTITION BY cluster) AS n
          FROM pc),
        sdrop AS (SELECT vec_id AS doc_id FROM pr
          WHERE NOT (rn <= ceil(0.5 * n::DOUBLE))),
        surv AS (SELECT d.doc_id, d.source,
            cast(len(list_filter(string_split_regex(lower(d.text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents d LEFT JOIN sdrop ON d.doc_id = sdrop.doc_id
          WHERE sdrop.doc_id IS NULL),
        caps AS (
          SELECT source, CAST(floor(8000.0 * w / sum(w) OVER ()) AS BIGINT) AS cap
          FROM (SELECT source, sqrt(sum(n_tokens)::DOUBLE) AS w FROM surv GROUP BY 1)),
        cum AS (
          SELECT t.doc_id, t.source, t.n_tokens, c.cap,
            sum(t.n_tokens) OVER (PARTITION BY t.source
              ORDER BY ((t.doc_id * 2654435761 + 12345) % 1000000007) % 1000000, t.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM surv t JOIN caps c ON t.source = c.source)
        SELECT doc_id, source, n_tokens, cap FROM cum
        WHERE cum <= cap ORDER BY doc_id""")),

    // ---- token-budget mixture: √supply caps per source, filled in
    // deterministic hash order — membership replayed row-for-row ----
    "x53_budget_mix" -> Q(
      (s, dir) => Sampling.budgetMix(
        Tables.documents(s, dir), "source", "doc_id",
        TextAnalysis.wordCount(col("text")), budget = 15000L)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("cap"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, source,
            cast(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents),
        caps AS (
          SELECT source, CAST(floor(15000.0 * w / sum(w) OVER ()) AS BIGINT) AS cap
          FROM (SELECT source, sqrt(sum(n_tokens)::DOUBLE) AS w FROM toks GROUP BY 1)),
        cum AS (
          SELECT t.doc_id, t.source, t.n_tokens, c.cap,
            sum(t.n_tokens) OVER (PARTITION BY t.source
              ORDER BY ((t.doc_id * 2654435761 + 12345) % 1000000007) % 1000000, t.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM toks t JOIN caps c ON t.source = c.source)
        SELECT doc_id, source, n_tokens, cap FROM cum
        WHERE cum <= cap ORDER BY doc_id""")),

    // ---- Gopher rule-based quality gate (Rae et al. 2021): the standard
    // cheap per-doc filters as boolean verdicts, conjunction as keep ----
    "x56_gopher_rules" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .withColumn("g", TextAnalysis.gopherFlags(col("text")))
        .select(col("doc_id"), col("g.n_words"),
          col("g.word_count_ok"), col("g.mean_word_len_ok"),
          col("g.symbol_ratio_ok"), col("g.bullet_ok"), col("g.ellipsis_ok"),
          col("g.alpha_ok"), col("g.stopword_ok"), col("g.keep"))
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
          SELECT doc_id, text,
            list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
            list_filter(list_distinct(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')),
              t -> t IN ('the','be','to','of','and','that','have','with')) AS stops,
            list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
          FROM documents)
        SELECT doc_id,
          cast(len(toks) AS BIGINT) AS n_words,
          len(toks) BETWEEN 50 AND 100000 AS word_count_ok,
          (length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
            / greatest(len(toks), 1)) BETWEEN 3.0 AND 10.0 AS mean_word_len_ok,
          (((length(text) - length(replace(text, '#', '')))
            + cast((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT))::DOUBLE
            / greatest(len(toks), 1)) <= 0.1 AS symbol_ratio_ok,
          (len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*')))::DOUBLE
            / greatest(len(lines), 1)) <= 0.9 AS bullet_ok,
          (len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE
            / greatest(len(lines), 1)) <= 0.3 AS ellipsis_ok,
          (len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
            / greatest(len(toks), 1)) >= 0.8 AS alpha_ok,
          len(stops) >= 2 AS stopword_ok,
          (len(toks) BETWEEN 50 AND 100000)
            AND ((length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
              / greatest(len(toks), 1)) BETWEEN 3.0 AND 10.0)
            AND ((((length(text) - length(replace(text, '#', '')))
              + cast((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT))::DOUBLE
              / greatest(len(toks), 1)) <= 0.1)
            AND ((len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*')))::DOUBLE
              / greatest(len(lines), 1)) <= 0.9)
            AND ((len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE
              / greatest(len(lines), 1)) <= 0.3)
            AND ((len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
              / greatest(len(toks), 1)) >= 0.8)
            AND (len(stops) >= 2) AS keep
        FROM base ORDER BY doc_id""")),

    // ---- DSIR importance weights: hashed-unigram target/raw log-ratio,
    // integer-exact per-doc sums; keep = more target-like than raw ----
    "x57_dsir_weights" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Sampling.dsirLogWeights(
          docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L),
          docs.filter(pmod(col("doc_id"), lit(20L)) === 0L),
          "doc_id", "text", buckets = 256)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS t
          FROM documents),
        tb AS (
          SELECT doc_id,
            (ascii(t) * 7919 + ascii(substr(t, -1, 1)) * 31 + length(t)) % 256 AS b
          FROM toks),
        ct AS (SELECT b, count(*) AS c FROM tb WHERE doc_id % 20 = 0 GROUP BY 1),
        cr AS (SELECT b, count(*) AS c FROM tb WHERE doc_id % 20 <> 0 GROUP BY 1),
        tots AS (SELECT (SELECT sum(c) FROM ct) AS ts, (SELECT sum(c) FROM cr) AS rs),
        lr AS (
          SELECT r.b,
            cast(round((ln((coalesce(ct.c, 0) + 1) / (tots.ts + 256.0))
                      - ln((coalesce(cr.c, 0) + 1) / (tots.rs + 256.0))) * 10000) AS BIGINT) AS lr
          FROM (SELECT unnest(range(0, 256)) AS b) r
          LEFT JOIN ct USING (b) LEFT JOIN cr USING (b) CROSS JOIN tots),
        w AS (
          SELECT doc_id, count(*) AS n_tokens, cast(sum(lr) AS BIGINT) AS logw_e4
          FROM tb JOIN lr USING (b) WHERE doc_id % 20 <> 0 GROUP BY 1)
        SELECT d.doc_id, cast(coalesce(w.n_tokens, 0) AS BIGINT) AS n_tokens,
          coalesce(w.logw_e4, 0) AS logw_e4,
          (coalesce(w.logw_e4, 0) > 0) AS keep
        FROM documents d LEFT JOIN w USING (doc_id)
        WHERE d.doc_id % 20 <> 0 ORDER BY 1""")),

    // ---- curation pipeline v5 (this round's gates composed): Gopher
    // content-rule gate -> frozen-table DSIR scoring of the survivors ->
    // per-source top-k by importance weight (WindowGroupLimit-able rank).
    // The stopword rule is omitted from the gate: the synthetic fixture
    // text contains no English stopwords, so it is vacuously false
    // corpus-wide (x56 still verifies it boolean-for-boolean); and the
    // DSIR rank replaces the sign threshold so selection binds at every
    // SF instead of depending on how target-like the fixture slice is. ----
    "x58_pipeline_v5" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val target = docs.filter(pmod(col("doc_id"), lit(20L)) === 0L)
        val raw = docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L)
        val gated = raw.withColumn("g", TextAnalysis.gopherFlags(col("text")))
          .filter(col("g.word_count_ok") && col("g.mean_word_len_ok") &&
            col("g.symbol_ratio_ok") && col("g.bullet_ok") &&
            col("g.ellipsis_ok") && col("g.alpha_ok"))
          .select(col("doc_id"), col("source"), col("text"))
        // the table is trained on the FULL raw corpus (same model as x57)
        // and frozen; only gate survivors are scored against it
        val table = Sampling.dsirTable(raw, target, "doc_id", "text", buckets = 256)
        // carrying `source` through the score keeps selection to ONE gated
        // scan — a rejoin here would re-run the whole regex gate on a
        // second full documents scan
        val scored = Sampling.dsirScore(gated, "doc_id", "text", table,
          carry = Seq("source"))
        Sampling.topKPerGroup(scored, "source", k = 8,
            Seq(col("logw_e4").desc, col("doc_id").asc))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("logw_e4"), col("rank"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS t
          FROM documents),
        tb AS (
          SELECT doc_id,
            (ascii(t) * 7919 + ascii(substr(t, -1, 1)) * 31 + length(t)) % 256 AS b
          FROM toks),
        ct AS (SELECT b, count(*) AS c FROM tb WHERE doc_id % 20 = 0 GROUP BY 1),
        cr AS (SELECT b, count(*) AS c FROM tb WHERE doc_id % 20 <> 0 GROUP BY 1),
        tots AS (SELECT (SELECT sum(c) FROM ct) AS ts, (SELECT sum(c) FROM cr) AS rs),
        lr AS (
          SELECT r.b,
            cast(round((ln((coalesce(ct.c, 0) + 1) / (tots.ts + 256.0))
                      - ln((coalesce(cr.c, 0) + 1) / (tots.rs + 256.0))) * 10000) AS BIGINT) AS lr
          FROM (SELECT unnest(range(0, 256)) AS b) r
          LEFT JOIN ct USING (b) LEFT JOIN cr USING (b) CROSS JOIN tots),
        w AS (
          SELECT doc_id, count(*) AS n_tokens, cast(sum(lr) AS BIGINT) AS logw_e4
          FROM tb JOIN lr USING (b) WHERE doc_id % 20 <> 0 GROUP BY 1),
        base AS (
          SELECT d.doc_id, d.source, d.text,
            list_filter(string_split_regex(d.text, '\s+'), x -> x <> '') AS dtoks,
            list_filter(string_split(d.text, chr(10)), x -> x <> '') AS lines
          FROM documents d WHERE d.doc_id % 20 <> 0),
        gated AS (
          SELECT doc_id, source FROM base
          WHERE (len(dtoks) BETWEEN 50 AND 100000)
            AND ((length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
              / greatest(len(dtoks), 1)) BETWEEN 3.0 AND 10.0)
            AND ((((length(text) - length(replace(text, '#', '')))
              + cast((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT))::DOUBLE
              / greatest(len(dtoks), 1)) <= 0.1)
            AND ((len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*')))::DOUBLE
              / greatest(len(lines), 1)) <= 0.9)
            AND ((len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE
              / greatest(len(lines), 1)) <= 0.3)
            AND ((len(list_filter(dtoks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
              / greatest(len(dtoks), 1)) >= 0.8)),
        scored AS (
          SELECT g.doc_id, g.source,
            cast(coalesce(w.n_tokens, 0) AS BIGINT) AS n_tokens,
            coalesce(w.logw_e4, 0) AS logw_e4
          FROM gated g LEFT JOIN w USING (doc_id)),
        ranked AS (
          SELECT *, cast(row_number() OVER (
            PARTITION BY source ORDER BY logw_e4 DESC, doc_id) AS INT) AS rank
          FROM scored)
        SELECT doc_id, source, n_tokens, logw_e4, rank
        FROM ranked WHERE rank <= 8 ORDER BY doc_id""")),

    // ---- learned quality classifier: fixed-epoch batch perceptron over
    // the DSIR hashed-unigram features, target (doc_id%20=0) vs rest.
    // Training is full-batch integer updates (order-free), so the oracle
    // replays all 3 epochs exactly as unrolled CTEs; margins are exact
    // long sums. Scores the raw (non-target) slice. ----
    "x59_quality_classifier" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = Sampling.perceptronTrain(docs, "doc_id", "text",
          positive = pmod(col("doc_id"), lit(20L)) === 0L,
          buckets = 256, epochs = 3)
        Sampling.perceptronScore(
            docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L),
            "doc_id", "text", w)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS t
          FROM documents),
        tb AS (
          SELECT doc_id,
            (ascii(t) * 7919 + ascii(substr(t, -1, 1)) * 31 + length(t)) % 256 AS b
          FROM toks),
        feat AS (SELECT doc_id, b, cast(count(*) AS BIGINT) AS c
                 FROM tb GROUP BY 1, 2),
        lab AS (SELECT doc_id,
                  cast(CASE WHEN doc_id % 20 = 0 THEN 1 ELSE -1 END AS BIGINT) AS y
                FROM documents),
        w1 AS (SELECT f.b, cast(sum(l.y * f.c) AS BIGINT) AS w
               FROM feat f JOIN lab l USING (doc_id) GROUP BY 1),
        b1 AS (SELECT cast(sum(y) AS BIGINT) AS bw FROM lab),
        s2 AS (SELECT f.doc_id, cast(sum(w1.w * f.c) AS BIGINT) AS fs
               FROM feat f JOIN w1 USING (b) GROUP BY 1),
        m2 AS (SELECT l.doc_id, l.y, coalesce(s2.fs, 0) + b1.bw AS m
               FROM lab l LEFT JOIN s2 USING (doc_id) CROSS JOIN b1),
        u2 AS (SELECT f.b, cast(sum(m.y * f.c) AS BIGINT) AS dw
               FROM m2 m JOIN feat f USING (doc_id)
               WHERE m.y * m.m <= 0 GROUP BY 1),
        w2 AS (SELECT w1.b, w1.w + coalesce(u2.dw, 0) AS w
               FROM w1 LEFT JOIN u2 USING (b)),
        b2 AS (SELECT b1.bw + coalesce(
                 (SELECT cast(sum(y) AS BIGINT) FROM m2 WHERE y * m <= 0), 0) AS bw
               FROM b1),
        s3 AS (SELECT f.doc_id, cast(sum(w2.w * f.c) AS BIGINT) AS fs
               FROM feat f JOIN w2 USING (b) GROUP BY 1),
        m3 AS (SELECT l.doc_id, l.y, coalesce(s3.fs, 0) + b2.bw AS m
               FROM lab l LEFT JOIN s3 USING (doc_id) CROSS JOIN b2),
        u3 AS (SELECT f.b, cast(sum(m.y * f.c) AS BIGINT) AS dw
               FROM m3 m JOIN feat f USING (doc_id)
               WHERE m.y * m.m <= 0 GROUP BY 1),
        w3 AS (SELECT w2.b, w2.w + coalesce(u3.dw, 0) AS w
               FROM w2 LEFT JOIN u3 USING (b)),
        b3 AS (SELECT b2.bw + coalesce(
                 (SELECT cast(sum(y) AS BIGINT) FROM m3 WHERE y * m <= 0), 0) AS bw
               FROM b2),
        sfin AS (SELECT f.doc_id, cast(sum(w3.w * f.c) AS BIGINT) AS fs
                 FROM feat f JOIN w3 USING (b) GROUP BY 1),
        n AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_tokens
              FROM tb GROUP BY 1)
        SELECT d.doc_id, cast(coalesce(n.n_tokens, 0) AS BIGINT) AS n_tokens,
          cast(coalesce(sfin.fs, 0) + b3.bw AS BIGINT) AS margin,
          (coalesce(sfin.fs, 0) + b3.bw > 0) AS keep
        FROM documents d CROSS JOIN b3
        LEFT JOIN sfin USING (doc_id) LEFT JOIN n USING (doc_id)
        WHERE d.doc_id % 20 <> 0 ORDER BY 1""")),

    // ---- boilerplate chunk removal: strip every occurrence of chunks
    // appearing in >= 3 distinct docs (x37 keeps the first copy; this
    // keeps none — the CCNet/RefinedWeb repeated-line rule at chunk
    // granularity) ----
    "x60_boilerplate_strip" -> Q(
      (s, dir) => Dedup.boilerplateStrip(
          Tables.documents(s, dir), "doc_id", "text", w = 5, minDf = 3L)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        ch AS (
          SELECT doc_id, i AS pos, array_to_string(toks[i*5+1:i*5+5], ' ') AS chunk
          FROM toks, unnest(range(0, cast(ceil(len(toks)/5.0) AS BIGINT))) AS r(i)),
        boiler AS (
          SELECT chunk FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
        k AS (
          SELECT c.doc_id, c.pos, c.chunk, (b.chunk IS NULL) AS keep
          FROM ch c LEFT JOIN boiler b USING (chunk)),
        agg AS (
          SELECT doc_id, cast(count(*) AS BIGINT) AS n_chunks,
            cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            coalesce(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos), '') AS clean_text
          FROM k GROUP BY 1)
        SELECT d.doc_id, cast(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
          cast(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
          coalesce(a.clean_text, '') AS clean_text
        FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY 1""")),

    // ---- held-out classifier evaluation: train the class-weighted
    // perceptron (posWeight = the 19:1 neg:pos ratio) on the hash-split
    // TRAIN partition only, then report per-class margin statistics on
    // the disjoint TEST partition — the filter's generalization, not its
    // training fit. Margin stats (exact long sums), not a keep-confusion:
    // the synthetic target slice is drawn from the same generator as raw,
    // so a sign cut is degenerate at some SFs — the eval's job is to
    // REPORT that (near-equal per-class margins), robustly at every SF.
    // Composes splitLabel (x22) with x59's train/score faces; the oracle
    // replays the same three epochs restricted to train docs by the same
    // affine-mod-prime split. ----
    "x61_classifier_eval" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val split = Sampling.splitLabel(col("doc_id"))
        val w = Sampling.perceptronTrain(
          docs.filter(split === "train"), "doc_id", "text",
          positive = pmod(col("doc_id"), lit(20L)) === 0L,
          buckets = 256, epochs = 3, posWeight = 19L)
        Sampling.perceptronScore(
            docs.filter(split === "test"), "doc_id", "text", w)
          .withColumn("is_target", pmod(col("doc_id"), lit(20L)) === 0L)
          .groupBy(col("is_target"))
          .agg(count(lit(1)).as("n"),
            sum(col("margin")).as("sum_margin"),
            min(col("margin")).as("min_margin"),
            max(col("margin")).as("max_margin"))
          .orderBy(col("is_target"))
      },
      Some("""WITH sp AS (
          SELECT doc_id, ((doc_id * 2654435761 + 12345) % 1000000007) % 100 AS sb
          FROM documents),
        toks AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS t
          FROM documents),
        tb AS (
          SELECT doc_id,
            (ascii(t) * 7919 + ascii(substr(t, -1, 1)) * 31 + length(t)) % 256 AS b
          FROM toks),
        feat AS (SELECT doc_id, b, cast(count(*) AS BIGINT) AS c
                 FROM tb GROUP BY 1, 2),
        lab AS (SELECT d.doc_id,
                  cast(CASE WHEN d.doc_id % 20 = 0 THEN 19 ELSE -1 END AS BIGINT) AS y
                FROM documents d JOIN sp USING (doc_id) WHERE sp.sb < 80),
        w1 AS (SELECT f.b, cast(sum(l.y * f.c) AS BIGINT) AS w
               FROM feat f JOIN lab l USING (doc_id) GROUP BY 1),
        b1 AS (SELECT cast(sum(y) AS BIGINT) AS bw FROM lab),
        s2 AS (SELECT f.doc_id, cast(sum(w1.w * f.c) AS BIGINT) AS fs
               FROM feat f JOIN w1 USING (b) GROUP BY 1),
        m2 AS (SELECT l.doc_id, l.y, coalesce(s2.fs, 0) + b1.bw AS m
               FROM lab l LEFT JOIN s2 USING (doc_id) CROSS JOIN b1),
        u2 AS (SELECT f.b, cast(sum(m.y * f.c) AS BIGINT) AS dw
               FROM m2 m JOIN feat f USING (doc_id)
               WHERE m.y * m.m <= 0 GROUP BY 1),
        w2 AS (SELECT w1.b, w1.w + coalesce(u2.dw, 0) AS w
               FROM w1 LEFT JOIN u2 USING (b)),
        b2 AS (SELECT b1.bw + coalesce(
                 (SELECT cast(sum(y) AS BIGINT) FROM m2 WHERE y * m <= 0), 0) AS bw
               FROM b1),
        s3 AS (SELECT f.doc_id, cast(sum(w2.w * f.c) AS BIGINT) AS fs
               FROM feat f JOIN w2 USING (b) GROUP BY 1),
        m3 AS (SELECT l.doc_id, l.y, coalesce(s3.fs, 0) + b2.bw AS m
               FROM lab l LEFT JOIN s3 USING (doc_id) CROSS JOIN b2),
        u3 AS (SELECT f.b, cast(sum(m.y * f.c) AS BIGINT) AS dw
               FROM m3 m JOIN feat f USING (doc_id)
               WHERE m.y * m.m <= 0 GROUP BY 1),
        w3 AS (SELECT w2.b, w2.w + coalesce(u3.dw, 0) AS w
               FROM w2 LEFT JOIN u3 USING (b)),
        b3 AS (SELECT b2.bw + coalesce(
                 (SELECT cast(sum(y) AS BIGINT) FROM m3 WHERE y * m <= 0), 0) AS bw
               FROM b2),
        sfin AS (SELECT f.doc_id, cast(sum(w3.w * f.c) AS BIGINT) AS fs
                 FROM feat f JOIN w3 USING (b) GROUP BY 1),
        scored AS (
          SELECT d.doc_id, (d.doc_id % 20 = 0) AS is_target,
            cast(coalesce(sfin.fs, 0) + b3.bw AS BIGINT) AS margin
          FROM documents d JOIN sp USING (doc_id) CROSS JOIN b3
          LEFT JOIN sfin USING (doc_id)
          WHERE sp.sb >= 90)
        SELECT is_target, cast(count(*) AS BIGINT) AS n,
          cast(sum(margin) AS BIGINT) AS sum_margin,
          cast(min(margin) AS BIGINT) AS min_margin,
          cast(max(margin) AS BIGINT) AS max_margin
        FROM scored GROUP BY 1 ORDER BY 1""")),

    // ---- curation pipeline v6: the x58 shape with the LEARNED scorer —
    // Gopher content-rule gate -> frozen class-weighted perceptron margins
    // over the survivors -> per-source top-k by margin. Rank, not sign:
    // the margin ORDERING is what selection consumes, so the pipeline
    // binds at every SF regardless of where the 0 threshold lands. The
    // model trains on the full corpus (target vs rest, 19:1 weighting);
    // scoring carries `source` through the fold — ONE gated scan, like
    // x58. ----
    "x62_pipeline_v6" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val raw = docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L)
        val gated = raw.withColumn("g", TextAnalysis.gopherFlags(col("text")))
          .filter(col("g.word_count_ok") && col("g.mean_word_len_ok") &&
            col("g.symbol_ratio_ok") && col("g.bullet_ok") &&
            col("g.ellipsis_ok") && col("g.alpha_ok"))
          .select(col("doc_id"), col("source"), col("text"))
        val w = Sampling.perceptronTrain(docs, "doc_id", "text",
          positive = pmod(col("doc_id"), lit(20L)) === 0L,
          buckets = 256, epochs = 3, posWeight = 19L)
        val scored = Sampling.perceptronScore(gated, "doc_id", "text", w,
          carry = Seq("source"))
        Sampling.topKPerGroup(scored, "source", k = 8,
            Seq(col("margin").desc, col("doc_id").asc))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("margin"), col("rank"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS t
          FROM documents),
        tb AS (
          SELECT doc_id,
            (ascii(t) * 7919 + ascii(substr(t, -1, 1)) * 31 + length(t)) % 256 AS b
          FROM toks),
        feat AS (SELECT doc_id, b, cast(count(*) AS BIGINT) AS c
                 FROM tb GROUP BY 1, 2),
        lab AS (SELECT doc_id,
                  cast(CASE WHEN doc_id % 20 = 0 THEN 19 ELSE -1 END AS BIGINT) AS y
                FROM documents),
        w1 AS (SELECT f.b, cast(sum(l.y * f.c) AS BIGINT) AS w
               FROM feat f JOIN lab l USING (doc_id) GROUP BY 1),
        b1 AS (SELECT cast(sum(y) AS BIGINT) AS bw FROM lab),
        s2 AS (SELECT f.doc_id, cast(sum(w1.w * f.c) AS BIGINT) AS fs
               FROM feat f JOIN w1 USING (b) GROUP BY 1),
        m2 AS (SELECT l.doc_id, l.y, coalesce(s2.fs, 0) + b1.bw AS m
               FROM lab l LEFT JOIN s2 USING (doc_id) CROSS JOIN b1),
        u2 AS (SELECT f.b, cast(sum(m.y * f.c) AS BIGINT) AS dw
               FROM m2 m JOIN feat f USING (doc_id)
               WHERE m.y * m.m <= 0 GROUP BY 1),
        w2 AS (SELECT w1.b, w1.w + coalesce(u2.dw, 0) AS w
               FROM w1 LEFT JOIN u2 USING (b)),
        b2 AS (SELECT b1.bw + coalesce(
                 (SELECT cast(sum(y) AS BIGINT) FROM m2 WHERE y * m <= 0), 0) AS bw
               FROM b1),
        s3 AS (SELECT f.doc_id, cast(sum(w2.w * f.c) AS BIGINT) AS fs
               FROM feat f JOIN w2 USING (b) GROUP BY 1),
        m3 AS (SELECT l.doc_id, l.y, coalesce(s3.fs, 0) + b2.bw AS m
               FROM lab l LEFT JOIN s3 USING (doc_id) CROSS JOIN b2),
        u3 AS (SELECT f.b, cast(sum(m.y * f.c) AS BIGINT) AS dw
               FROM m3 m JOIN feat f USING (doc_id)
               WHERE m.y * m.m <= 0 GROUP BY 1),
        w3 AS (SELECT w2.b, w2.w + coalesce(u3.dw, 0) AS w
               FROM w2 LEFT JOIN u3 USING (b)),
        b3 AS (SELECT b2.bw + coalesce(
                 (SELECT cast(sum(y) AS BIGINT) FROM m3 WHERE y * m <= 0), 0) AS bw
               FROM b2),
        sfin AS (SELECT f.doc_id, cast(sum(w3.w * f.c) AS BIGINT) AS fs
                 FROM feat f JOIN w3 USING (b) GROUP BY 1),
        n AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_tokens
              FROM tb GROUP BY 1),
        base AS (
          SELECT d.doc_id, d.source, d.text,
            list_filter(string_split_regex(d.text, '\s+'), x -> x <> '') AS dtoks,
            list_filter(string_split(d.text, chr(10)), x -> x <> '') AS lines
          FROM documents d WHERE d.doc_id % 20 <> 0),
        gated AS (
          SELECT doc_id, source FROM base
          WHERE (len(dtoks) BETWEEN 50 AND 100000)
            AND ((length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
              / greatest(len(dtoks), 1)) BETWEEN 3.0 AND 10.0)
            AND ((((length(text) - length(replace(text, '#', '')))
              + cast((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT))::DOUBLE
              / greatest(len(dtoks), 1)) <= 0.1)
            AND ((len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*')))::DOUBLE
              / greatest(len(lines), 1)) <= 0.9)
            AND ((len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE
              / greatest(len(lines), 1)) <= 0.3)
            AND ((len(list_filter(dtoks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
              / greatest(len(dtoks), 1)) >= 0.8)),
        scored AS (
          SELECT g.doc_id, g.source,
            cast(coalesce(n.n_tokens, 0) AS BIGINT) AS n_tokens,
            cast(coalesce(sfin.fs, 0) + b3.bw AS BIGINT) AS margin
          FROM gated g CROSS JOIN b3
          LEFT JOIN sfin USING (doc_id) LEFT JOIN n USING (doc_id)),
        ranked AS (
          SELECT *, cast(row_number() OVER (
            PARTITION BY source ORDER BY margin DESC, doc_id) AS INT) AS rank
          FROM scored)
        SELECT doc_id, source, n_tokens, margin, rank
        FROM ranked WHERE rank <= 8 ORDER BY doc_id""")),

    // ---- CCNet-style bigram-LM perplexity filter (Wenzek et al. 2019):
    // train a hashed-bigram LM on the trusted slice (doc_id % 20 == 0),
    // score the raw slice under it; keep = mean bigram log-prob clears the
    // cut (integer cross-multiply — the perplexity threshold replays with
    // no division). The whole model is the buckets^2 smoothed table; both
    // engines rebuild it from the counts and agree cell-for-cell ----
    "x63_lm_perplexity" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val table = Sampling.bigramLmTable(
          docs.filter(pmod(col("doc_id"), lit(20L)) === 0L),
          "doc_id", "text", buckets = 256)
        // -4.8 mean bigram log-prob (ppl ~ e^4.8): binds on the fixture —
        // the synthetic corpus spans roughly [-5.2, -4.3] per bigram
        Sampling.bigramLmScore(
          docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L),
          "doc_id", "text", table, minAvgE4 = 48000L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l
          FROM documents),
        hs AS (
          SELECT doc_id, list_transform(l,
            t -> (ascii(t) * 7919 + ascii(substr(t, -1, 1)) * 31 + length(t)) % 256) AS h
          FROM toks),
        bg AS (
          SELECT doc_id, unnest(list_transform(range(2, len(h) + 1),
            i -> h[i-1] * 256 + h[i])) AS k
          FROM hs WHERE len(h) >= 2),
        cb AS (SELECT k, cast(count(*) AS BIGINT) AS c
               FROM bg WHERE doc_id % 20 = 0 GROUP BY 1),
        cc AS (SELECT k // 256 AS h1, cast(sum(c) AS BIGINT) AS c1
               FROM cb GROUP BY 1),
        sc AS (
          SELECT bg.doc_id, cast(count(*) AS BIGINT) AS n_bigrams,
            cast(sum(cast(round((ln(coalesce(cb.c, 0) + 1.0)
                  - ln(coalesce(cc.c1, 0) + 256.0)) * 10000) AS BIGINT)) AS BIGINT) AS lp_e4
          FROM bg LEFT JOIN cb USING (k)
          LEFT JOIN cc ON cc.h1 = bg.k // 256
          WHERE bg.doc_id % 20 <> 0 GROUP BY 1)
        SELECT d.doc_id, cast(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
          coalesce(sc.lp_e4, 0) AS lp_e4,
          (coalesce(sc.lp_e4, 0) >= -48000 * coalesce(sc.n_bigrams, 0)) AS keep
        FROM documents d LEFT JOIN sc USING (doc_id)
        WHERE d.doc_id % 20 <> 0 ORDER BY 1"""))
  )
}
