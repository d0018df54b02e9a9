package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Blocked fuzzy candidate generation for entity resolution.
  *
  * BLOCKING CONTRACT (the DedupOps-style documented cap): a candidate pair
  * is generated ONLY if the two names agree EXACTLY on at least one
  * blocking key. A typo that lands inside a blocking key knocks that key
  * out; a pair whose every key is corrupted escapes matching entirely —
  * that is the inherent recall trade of equality blocking, not a bug.
  * Concretely, for word-of-name keys:
  *
  *  - ONE key (e.g. the 2nd word): a typo anywhere in that word — or in
  *    the separator that delimits it — escapes. Measured on planted
  *    single-character deletions over this repo's part-name fixture,
  *    recall ≈ the fraction of characters OUTSIDE the blocked word
  *    (~0.45 — ErBlockingSpec measures it exactly).
  *  - The UNION of per-word keys (every word is a key): a single in-word
  *    typo leaves every OTHER word intact, so exactly one key survives
  *    and the pair blocks. The only single-deletion escapes are the
  *    separators themselves (deleting a space merges two words and
  *    corrupts both adjacent keys) — recall = 1 − separators/length
  *    (~0.90 here, again measured exactly). Residual-risk path beyond
  *    that: n-gram or phonetic keys, the same union shape.
  *
  * Cost contract: each key's self-join is equality-blocked — the pair
  * space is Σ_key Σ_block block², never |names|². Keys are meant to be
  * run over the DEDUPLICATED NAME table (vocabulary scale), and skewed
  * blocks fall under the same opt-in cap rules as DedupOps banding. */
object FuzzyMatch {

  /** Candidate pairs (src < dst, distinct) from the UNION of equality
    * blocks over `blockCols`, kept when levenshtein ≤ `maxDist`. `names`
    * must carry one row per name with a unique numeric `idCol` and the
    * precomputed blocking-key columns (null keys never block — SQL
    * equality semantics). */
  def blockedPairs(names: DataFrame, idCol: String, nameCol: String,
                   blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "at least one blocking key")
    blockCols.map { bc =>
      names.alias("a").join(names.alias("b"),
          col(s"a.$bc") === col(s"b.$bc") &&
            col(s"a.$idCol") < col(s"b.$idCol") &&
            levenshtein(col(s"a.$nameCol"), col(s"b.$nameCol")) <= maxDist)
        .select(col(s"a.$idCol").as("src"), col(s"b.$idCol").as("dst"))
    }.reduce(_ unionByName _).distinct()
  }

  /** The i-th whitespace-separated word of a name (1-based) — the
    * standard word blocking key; null when the word doesn't exist. */
  def wordKey(name: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    element_at(F.split(name, " "), i)
}
