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
    * empty-result semantics.
    *
    * The hashed path routes through the fused native kernel
    * [[graft.functions.ShingleHash64]] (one tokenize + byte-level concat +
    * hash-set dedup per row) — bit-identical to the declarative chain below
    * (ExpressionSpec asserts equality on the fixture), ~3× less per-row
    * allocation on the jaccard/minhash/components hot path. */
  def shingleArray(text: Column, hashed: Boolean)
                  (implicit s: org.apache.spark.sql.SparkSession): Column =
    if (hashed) {
      // explicit session (review r3): registering on SparkSession.active
      // would silently target the wrong session in multi-session setups
      graft.functions.GraftExpressions.register(s)
      call_function(graft.functions.GraftExpressions.ShingleName, text)
    } else {
      val toks = split(text, " ")
      array_distinct(transform(
        when(size(toks) >= 3, sequence(lit(0), size(toks) - 3))
          .otherwise(array().cast("array<int>")),
        i => array_join(slice(toks, i + 1, lit(3)), " ")))
    }
}
