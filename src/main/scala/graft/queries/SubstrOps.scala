package graft.queries

import graft.{QueryPack, Tables}
import graft.operators.SubstrDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Cross-document repeated-substring detection over the `documents`
  * table — the character-RUN duplication modality
  * ([[graft.operators.SubstrDedup]]): d24/d11 catch whole-set token
  * overlap, d40–d43 catch whole-head edit proximity, and these two
  * catch long verbatim runs (boilerplate footers, licence blocks,
  * repeated paragraphs) embedded in otherwise-distinct documents —
  * the duplication class Lee et al. (ACL 2022) showed matters most for
  * LM training corpora. All three are oracle-checked against DuckDB's
  * all-positions enumeration; the anchor/scale split mirrors
  * d24-vs-d11: d44 pays the honest all-grams pass to pin semantics,
  * d45 is the winnowed shape that holds at 100 TB and still matches
  * the SAME exhaustive oracle exactly (the winnowing guarantee makes
  * it exact, not approximate, for the ≥ k+w−1 contract), and d46
  * executes the cut — the corpus TRANSFORMATION, not just the report.
  */
object SubstrOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, QueryFn] = Map(
    // EXACT ANCHOR: every 40-codepoint gram of every document,
    // grouped; grams living in >= 2 distinct documents, with the
    // distinct-doc count. O(corpus * 40) shuffled bytes by contract —
    // the all-positions corpus pass that pins what "repeated run"
    // means, same role d24 plays for the LSH family.
    "d44_repeated_grams" -> { (s, dir) =>
      SubstrDedup.repeatedGramDocs(t(s, dir, "documents"),
        "doc_id", "text", L = 40)
    },
    // THE SCALE PATH, still exact: distinct doc pairs sharing a run of
    // >= 59 codepoints, found via winnowed fingerprints (k=40, w=20,
    // density ~2/21) + per-pair verification against real text. The
    // fingerprint join shuffles 16-byte rows for ~10% of positions
    // instead of 59-byte grams for all positions; candidates form only
    // on fingerprint-hash agreement; texts move once per candidate id.
    // Same exhaustive oracle shape as d44 — the winnowing guarantee
    // (see [[graft.functions.Winnow]]) is what lets a sampled index
    // answer an exact predicate.
    "d45_long_repeat_pairs" -> { (s, dir) =>
      SubstrDedup.longRepeatPairs(t(s, dir, "documents"),
        "doc_id", "text", minLen = 59, w = 20)
    },
    // THE CUT ITSELF: documents re-emitted with every codepoint covered
    // by a 59-gram shared with a smaller-id document removed and the
    // surviving segments re-joined — Lee et al.'s ExactSubstr dedup as
    // a corpus transformation, keep-first survivorship. Linear shape:
    // min-id per gram joined back (a d-doc boilerplate gram costs d
    // rows, never d²), one sorted start array per affected doc, one
    // aggregate() fold doing interval-merged substr slices. Verified
    // character-for-character against DuckDB's ordered string_agg
    // reconstruction.
    "d46_exact_substr_clean" -> { (s, dir) =>
      SubstrDedup.cleanText(t(s, dir, "documents"),
        "doc_id", "text", L = 59)
    },
    // THE BIPARTITE CUT: src0's documents scrubbed against the
    // immutable reference of every OTHER source — the production shape
    // of ExactSubstr dedup (a frozen training corpus, a stream of
    // candidate additions; the reference keeps everything, arrivals
    // shed every span the reference already holds, arrival-to-arrival
    // sharing is untouched). The probe joins the one-representative-
    // per-distinct-gram index on the 64-bit hash (bounded fan-out on
    // hot boilerplate grams) and verifies against reference TEXT, so
    // collisions cannot mis-cut. Same operator the streaming scrub
    // runs per micro-batch.
    "d47_scrub_against_corpus" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      SubstrDedup.scrubAgainstCorpus(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"),
        "doc_id", "text", L = 59)
    },
  )

  def oracleSql: Map[String, String] = Map(
    "d44_repeated_grams" ->
      """WITH pos AS (
           SELECT doc_id, text,
                  unnest(generate_series(1, length(text) - 39)) AS p
           FROM documents WHERE length(text) >= 40
         )
         SELECT substr(text, p, 40) AS gram,
                count(DISTINCT doc_id) AS n_docs
         FROM pos GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""",
    "d45_long_repeat_pairs" ->
      """WITH pos AS (
           SELECT doc_id, text,
                  unnest(generate_series(1, length(text) - 58)) AS p
           FROM documents WHERE length(text) >= 59
         ), g AS (
           SELECT substr(text, p, 59) AS g, doc_id FROM pos
         )
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id""",
    "d46_exact_substr_clean" ->
      """WITH pos AS (
           SELECT doc_id, text,
                  unnest(generate_series(1, length(text) - 58)) AS p
           FROM documents WHERE length(text) >= 59
         ), g AS (
           SELECT doc_id, p, substr(text, p, 59) AS g FROM pos
         ), mn AS (
           SELECT g, min(doc_id) AS mnid FROM g GROUP BY g
         ), cov AS (
           SELECT a.doc_id, a.p FROM g a JOIN mn ON a.g = mn.g
           WHERE mn.mnid < a.doc_id
         ), mask AS (
           SELECT DISTINCT doc_id, q FROM (
             SELECT doc_id, unnest(generate_series(p, p + 58)) AS q
             FROM cov)
         ), chars AS (
           SELECT doc_id, text,
                  unnest(generate_series(1, length(text))) AS i
           FROM documents
         ), agg AS (
           SELECT c.doc_id,
                  string_agg(CASE WHEN m.q IS NULL
                    THEN substr(c.text, c.i, 1) END, ''
                    ORDER BY c.i) AS ct
           FROM chars c LEFT JOIN mask m
             ON m.doc_id = c.doc_id AND m.q = c.i
           GROUP BY c.doc_id
         )
         SELECT d.doc_id, coalesce(a.ct, '') AS clean_text
         FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""",
    "d47_scrub_against_corpus" ->
      """WITH rg AS (
           SELECT DISTINCT substr(text, p, 59) AS g FROM (
             SELECT text,
                    unnest(generate_series(1, length(text) - 58)) AS p
             FROM documents
             WHERE source <> 'src0' AND length(text) >= 59)
         ), arr AS (
           SELECT doc_id, text FROM documents WHERE source = 'src0'
         ), apos AS (
           SELECT doc_id, text,
                  unnest(generate_series(1, length(text) - 58)) AS p
           FROM arr WHERE length(text) >= 59
         ), cov AS (
           SELECT a.doc_id, a.p
           FROM apos a JOIN rg ON substr(a.text, a.p, 59) = rg.g
         ), mask AS (
           SELECT DISTINCT doc_id, q FROM (
             SELECT doc_id, unnest(generate_series(p, p + 58)) AS q
             FROM cov)
         ), chars AS (
           SELECT doc_id, text,
                  unnest(generate_series(1, length(text))) AS i
           FROM arr
         ), agg AS (
           SELECT c.doc_id,
                  string_agg(CASE WHEN m.q IS NULL
                    THEN substr(c.text, c.i, 1) END, ''
                    ORDER BY c.i) AS ct
           FROM chars c LEFT JOIN mask m
             ON m.doc_id = c.doc_id AND m.q = c.i
           GROUP BY c.doc_id
         )
         SELECT d.doc_id, coalesce(a.ct, '') AS clean_text
         FROM arr d LEFT JOIN agg a ON a.doc_id = d.doc_id""",
  )
}
