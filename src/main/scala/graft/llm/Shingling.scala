package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Single source of truth for the 3-token shingle kernel. TextOps (exact
  * Jaccard), DedupOps (minhash signatures) and jaccard_pairs' hashed posting
  * lists MUST tokenize identically, or exact-Jaccard, LSH-candidate and
  * oracle semantics silently diverge — round 2's <3-token guard (ADVICE r1)
  * had to be patched in three copies before this hoist.
  */
object Shingling {

  /** Distinct 3-token shingles of `text` as an array column. `hashed=true`
    * maps each shingle through xxhash64 — 8-byte join keys instead of ~25-
    * byte strings for the shuffle-heavy consumers. Docs with <3 tokens
    * yield an empty array (sequence(0, size-3) would otherwise infer step
    * -1 and slice() would throw), matching the oracle's range(1, len-1)
    * empty-result semantics. */
  def shingleArray(text: Column, hashed: Boolean): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      when(size(toks) >= 3, sequence(lit(0), size(toks) - 3))
        .otherwise(array().cast("array<int>")),
      i => {
        val sh = array_join(slice(toks, i + 1, lit(3)), " ")
        if (hashed) xxhash64(sh) else sh
      }))
  }
}
