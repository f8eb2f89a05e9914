package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression for the exact quantized integer dot product
  * used by the vector ops (§2.11). The declarative form —
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` — routes through two
  * HigherOrderFunction nodes that allocate an intermediate array and invoke
  * lambda closures per element; this expression is a single fused
  * whole-stage-codegen loop over the two ArrayData buffers (preference rung
  * (b) of the custom-operator ladder: a native Expression with doGenCode
  * beats composing HOFs, beats a Scala UDF).
  *
  * Semantics: EXACTLY the HOF form's — Σ a(i)*b(i) when len(a)==len(b);
  * NULL if either array is NULL, any paired element is NULL, or the lengths
  * differ (zip_with pads the shorter array with NULL elements, which null
  * the product and then the sum). Exact equivalence is what makes
  * [[graft.plans.RewriteDotProduct]] a sound optimizer rewrite.
  */
case class DotQ(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // always nullable: a NULL *element* nulls the result even when both
  // array children are non-nullable (ev.isNull must be a real variable)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_q"

  // NULL element => NULL result, matching aggregate(zip_with(a,b,_*_),0,_+_)
  // semantics (x*null -> null, acc+null -> null). Without the per-element
  // check, ArrayData.getLong on a null slot reads 0/garbage silently.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // per-element null branch only for sides that can actually hold null
      // elements — e.g. the IVF plane literals are containsNull=false, so
      // their side of the fused loop stays branch-free
      val checks = Seq(
        if (left.dataType.asInstanceOf[ArrayType].containsNull) Some(s"$a.isNullAt($i)") else None,
        if (right.dataType.asInstanceOf[ArrayType].containsNull) Some(s"$b.isNullAt($i)") else None
      ).flatten
      val nullGuard =
        if (checks.isEmpty) ""
        else s"if (${checks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native sign-LSH cell encoder: bit p of the result is set iff
  * Σ_d vec(d)·planes(p)(d) ≥ 0 — the whole multi-plane signature in ONE
  * expression whose GENERATED CODE SIZE IS CONSTANT in the plane count
  * (the plane matrix is runtime data, looped over, never unrolled).
  *
  * Why it exists (round 12, found by the 100× probe): dedup_near_embedding's
  * occupancy-targeted index needs planes that GROW with the corpus
  * (10 at 200k vectors), and the declarative form — a sum of per-plane
  * `when(dot_q(qe, lit(plane)) >= 0, 1<<p)` terms — unrolls 80 dot loops
  * into one consume method. Janino compiles it (under 64 KB), but the
  * method exceeds HotSpot's HugeMethodLimit (~8 KB bytecode), is NEVER
  * JIT-compiled, and runs in the bytecode interpreter: 57 s vs 2.7 s for
  * the 24-dot version at 200k vectors. Same defect class as the r7
  * PqEncode fix, one layer down (JIT, not janino).
  *
  * Semantics: NULL if the vector is NULL, any vector element is NULL, or
  * any plane's length differs from the vector's. Planes is expected to be
  * a literal array<array<bigint>> with ≤64 rows (bit p maps to 1L<<p).
  */
case class SignPlanes(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<array<bigint>>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sign_planes"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val ps = b.asInstanceOf[ArrayData]
    val nP = ps.numElements()
    val n = v.numElements()
    var mask = 0L
    var p = 0
    while (p < nP) {
      val plane = ps.getArray(p)
      if (plane.numElements() != n) return null
      var acc = 0L
      var d = 0
      while (d < n) {
        if (v.isNullAt(d)) return null
        acc += v.getLong(d) * plane.getLong(d)
        d += 1
      }
      if (acc >= 0L) mask |= (1L << p)
      p += 1
    }
    mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nP = ctx.freshName("nP")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val mask = ctx.freshName("mask")
      val plane = ctx.freshName("plane")
      val bad = ctx.freshName("bad")
      val vecNullGuard =
        if (left.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($a.isNullAt($d)) { $bad = true; break; }"
        else ""
      s"""
         |int $nP = $b.numElements();
         |int $n = $a.numElements();
         |long $mask = 0L;
         |boolean $bad = false;
         |for (int $p = 0; $p < $nP; $p++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $plane = $b.getArray($p);
         |  if ($plane.numElements() != $n) { $bad = true; break; }
         |  long $acc = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $vecNullGuard
         |    $acc += $a.getLong($d) * $plane.getLong($d);
         |  }
         |  if ($bad) break;
         |  if ($acc >= 0L) $mask |= (1L << $p);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $mask; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen probe into a broadcast [[BloomFilter]] (the semi-join
  * reduction in `join_bloom_prefilter`). Replaces a per-row Scala UDF: a
  * ScalaUDF boxes every key, breaks WholeStageCodegen on the fact-table
  * scan, and hides the predicate from the optimizer; this expression is one
  * virtual call inside the fused scan loop. The sketch rides the plan as a
  * Broadcast handle — each executor fetches it once from the broadcast
  * store instead of re-shipping the bit array with every task closure.
  *
  * Semantics: `mightContainLong(key)`; NULL key => NULL (a Filter then
  * drops the row, matching SQL 3VL for a membership predicate). An empty
  * bloom (built over zero rows) answers false for every key.
  */
case class BloomMightContain(child: Expression, bloomBc: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got $t")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(key: Any): Any =
    bloomBc.value.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    // materialize the broadcast once per generated-class instance, not per row
    val bloom = ctx.addMutableState(bloomCls, "graftBloom",
      v => s"$v = ($bloomCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $bloom.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native product-quantization encoder: argmin_k ||sub_m - c_{m,k}||² per
  * subspace over a quantized BIGINT vector, emitting the M one-byte codes as
  * array<int>. Replaces the declarative lowering (M × K `array_min(array(
  * struct(cSq - 2*DotQ(sub, lit(c)), k)))` trees): at M=16, K=16 that tree's
  * generated `doConsume` exceeds the JVM 64 KB method limit, janino fails,
  * and the hottest IVF-PQ stages run interpreted (round-6 verdict, weak
  * component). Here the codebook is DATA — a reference object looped over in
  * `doGenCode` — so generated-code size is constant in M×K.
  *
  * Semantics match the literal tree exactly: distances are exact BIGINT
  * Σ(c_i² - 2·c_i·q_i) (the code-independent Σq_i² dropped, preserving the
  * argmin), ties break on smallest k (strict `<` keeps the first winner,
  * mirroring struct ordering / the oracle's ORDER BY dist, k). NULL input,
  * a NULL element, or a length ≠ M·subDim yields NULL (DotQ's convention).
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Long]]])
  extends UnaryExpression {

  private def m = codebook.length
  private def subDim = codebook(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val qe = input.asInstanceOf[ArrayData]
    if (qe.numElements() != m * subDim) return null
    var i = 0
    while (i < m * subDim) { if (qe.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Long.MaxValue
      var bestK = 0
      var k = 0
      while (k < codebook(mi).length) {
        val c = codebook(mi)(k)
        var s = 0L
        var j = 0
        while (j < subDim) {
          val cv = c(j)
          s += cv * cv - 2L * cv * qe.getLong(mi * subDim + j)
          j += 1
        }
        if (s < best) { best = s; bestK = k }
        k += 1
      }
      codes(mi) = bestK
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[][][]")
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val cv = ctx.freshName("cv")
      val best = ctx.freshName("best")
      val bestK = ctx.freshName("bestK")
      val c = ctx.freshName("c")
      val nullScan =
        if (child.dataType.asInstanceOf[ArrayType].containsNull)
          s"""for (int $j = 0; $j < ${m * subDim} && !${ev.isNull}; $j++) {
             |  if ($a.isNullAt($j)) ${ev.isNull} = true;
             |}""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |}
         |$nullScan
         |if (!${ev.isNull}) {
         |  int[] $codes = new int[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    long $best = Long.MAX_VALUE;
         |    int $bestK = 0;
         |    for (int $k = 0; $k < $cb[$mi].length; $k++) {
         |      long[] $c = $cb[$mi][$k];
         |      long $s = 0L;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        long $cv = $c[$j];
         |        $s += $cv * $cv - 2L * $cv * $a.getLong($mi * $subDim + $j);
         |      }
         |      if ($s < $best) { $best = $s; $bestK = $k; }
         |    }
         |    $codes[$mi] = $bestK;
         |  }
         |  ${ev.value} = new $gad($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native ADC lookup-table builder for IVF-PQ asymmetric-distance scoring:
  * lut[m][k] = ||q_m - c_{m,k}||² = Σ(q_i - c_i)² exact BIGINT — the same
  * value as the declarative `subSq + cSq - 2·DotQ` form it replaces (that
  * form was another M×K literal expression tree feeding the same oversized
  * generated method as the PQ encoder). Output array<array<bigint>> indexed
  * `element_at(element_at(lut, m+1), code+1)`. NULL rules as [[PqEncode]].
  */
case class PqAdcLut(child: Expression, codebook: Array[Array[Array[Long]]])
  extends UnaryExpression {

  private def m = codebook.length
  private def subDim = codebook(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc_lut"

  override protected def nullSafeEval(input: Any): Any = {
    val qe = input.asInstanceOf[ArrayData]
    if (qe.numElements() != m * subDim) return null
    var i = 0
    while (i < m * subDim) { if (qe.isNullAt(i)) return null; i += 1 }
    val rows = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val row = new Array[Long](codebook(mi).length)
      var k = 0
      while (k < row.length) {
        val c = codebook(mi)(k)
        var s = 0L
        var j = 0
        while (j < subDim) {
          val d = qe.getLong(mi * subDim + j) - c(j)
          s += d * d
          j += 1
        }
        row(k) = s
        k += 1
      }
      rows(mi) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[][][]")
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    nullSafeCodeGen(ctx, ev, a => {
      val rows = ctx.freshName("rows")
      val row = ctx.freshName("row")
      val mi = ctx.freshName("mi")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val nullScan =
        if (child.dataType.asInstanceOf[ArrayType].containsNull)
          s"""for (int $j = 0; $j < ${m * subDim} && !${ev.isNull}; $j++) {
             |  if ($a.isNullAt($j)) ${ev.isNull} = true;
             |}""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |}
         |$nullScan
         |if (!${ev.isNull}) {
         |  $ad[] $rows = new $ad[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    long[] $row = new long[$cb[$mi].length];
         |    for (int $k = 0; $k < $row.length; $k++) {
         |      long $s = 0L;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        long $d = $a.getLong($mi * $subDim + $j) - $cb[$mi][$k][$j];
         |        $s += $d * $d;
         |      }
         |      $row[$k] = $s;
         |    }
         |    $rows[$mi] = new $gad($row);
         |  }
         |  ${ev.value} = new $gad($rows);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session-level registration for graft's native expressions. Registered in
  * the session FunctionRegistry (idempotent) rather than via
  * SparkSessionExtensions so they work on ANY already-built session — the
  * driver harness constructs its own SparkSession and passes it in.
  */
/** Map-side char-bigram LM scorer for `docs_lm_quality_filter`: given a
  * doc's lang and its bigram array, returns `array(matched, sum_nll)` — the
  * count of bigrams found in the language model and the exact integer sum of
  * their quantized NLLs. The LM rides the expression as a driver-built
  * nested HashMap (lang → bigram → nll_q): it is charset²×langs-bounded
  * MODEL state at any corpus size — the same legitimate driver-state
  * pattern as the k-means centroids — so a lookup here replaces what was a
  * 198M-row broadcast-hash-join + groupBy(doc_id) shuffle at the 100× probe
  * scale (the measured 21.7×-at-100× growth term: the join stage
  * materializes an occurrence-sized row stream just to sum it back down to
  * one row per doc; this expression folds the whole sum into the scan).
  *
  * Semantics match the inner join + groupBy they replace: a bigram missing
  * from the LM (impossible when the LM is trained on the same corpus, but
  * kept faithful) contributes to neither count nor sum; an unknown lang
  * yields (0, 0) — the caller's `n_bigrams >= 1` filter then drops the doc
  * exactly as the inner join produced no group. NULL lang, NULL array, or a
  * NULL element propagate NULL (the join's Filter(isnotnull) dropped those
  * rows; the caller's filter drops NULL the same way). Raw java.util.HashMap
  * (janino has no generics) keyed by UTF8String: the inner map resolves once
  * per row, per-element lookups allocate nothing.
  */
case class LmNllSum(left: Expression, right: Expression,
    lm: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.StringType, ArrayType(org.apache.spark.sql.types.StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lm_nll_sum"

  override protected def nullSafeEval(langV: Any, arrV: Any): Any = {
    val arr = arrV.asInstanceOf[ArrayData]
    val inner = lm.get(langV.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    var n = 0L
    var s = 0L
    if (inner != null) {
      var i = 0
      val len = arr.numElements()
      while (i < len) {
        if (arr.isNullAt(i)) return null
        val v = inner.get(arr.getUTF8String(i))
        if (v != null) { n += 1L; s += v.longValue() }
        i += 1
      }
    } else {
      var i = 0
      val len = arr.numElements()
      while (i < len) { if (arr.isNullAt(i)) return null; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(n, s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lmRef = ctx.addReferenceObj("graftLmMap", lm, "java.util.HashMap")
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    nullSafeCodeGen(ctx, ev, (langV, arrV) => {
      val inner = ctx.freshName("inner")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val v = ctx.freshName("v")
      val nullGuard =
        if (right.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($arrV.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |java.util.HashMap $inner = (java.util.HashMap) $lmRef.get($langV);
         |long $n = 0L;
         |long $s = 0L;
         |int $len = $arrV.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  $nullGuard
         |  if ($inner != null) {
         |    Object $v = $inner.get($arrV.getUTF8String($i));
         |    if ($v != null) { $n += 1L; $s += ((java.lang.Long) $v).longValue(); }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new $gad(new long[]{$n, $s});
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd portable rolling content hash — the seedless char fold
  * `acc = (acc·31 + codepoint) mod 2³¹, acc₀ = 17` that docs_split_assign /
  * docs_temperature_resample / docs_split_leakage / text_hashed_features
  * replay in DuckDB as `list_reduce(..., (a,c) -> (a*31+c) % 2147483648)`.
  *
  * The declarative form (`aggregate(transform(sequence(1, length), i =>
  * ascii(substr(i, 1))), 17, fold)`) routes every CHARACTER through a
  * per-position substr (UTF8String locates char i by scanning from byte 0),
  * an ascii() call, an array materialization, and two interpreted lambda
  * invocations — measured as the dominant term of docs_split_leakage's
  * 100× probe wall (~22 s of split-side work at 500k docs). This
  * expression is one fused loop over the string's codepoints inside
  * whole-stage codegen. Kept bit-identical to the HOF twin on the
  * documented ASCII domain (PropertySpec asserts it); on multibyte text it
  * follows the ORACLE's semantics (DuckDB `ord` = codepoint), which is the
  * contract that matters.
  *
  * NULL text => NULL (same 3VL propagation the HOF form was fixed to in
  * ADVICE r9); empty string => 17 (the seed), matching
  * `list_reduce(list_prepend(17, []))`.
  */
case class RollingHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_hash31"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var acc = 17L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483648L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 17L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + (long) $cp) % 2147483648L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftExpressions {
  val DotQName = "graft_dot_q"
  val HllName = "graft_hll_distinct"
  val ShingleName = "graft_shingle_hash64"
  val SignPlanesName = "graft_sign_planes"

  def register(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val reg = cs.sessionState.functionRegistry
    // skip when already bound: createOrReplaceTempFunction logs a WARN per
    // replacement, and register() runs once per query build
    def bind(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    bind(DotQName, exprs => DotQ(exprs.head, exprs(1)))
    // bare AggregateFunction: the analyzer wraps it in AggregateExpression
    bind(HllName, exprs => HllDistinct(exprs.head))
    bind(ShingleName, exprs => ShingleHash64(exprs.head))
    bind(SignPlanesName, exprs => SignPlanes(exprs.head, exprs(1)))
  }

  /** Column form of the fused dot product; registers on first use. */
  def dotQ(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(DotQName, a, b)
  }

  /** Column form of the constant-code-size multi-plane sign encoder;
    * registers on first use. */
  def signPlanes(spark: SparkSession, vec: Column, planes: Column): Column = {
    register(spark)
    call_function(SignPlanesName, vec, planes)
  }

  /** Column form of the mergeable HLL distinct-count; registers on first use. */
  def hllDistinct(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(HllName, c)
  }

  /** Column form of the native bloom probe. The broadcast sketch handle has
    * no SQL-literal representation, so the Column is built directly from the
    * expression (ColumnBridge/ExpressionUtils) — no mutable FunctionRegistry
    * state, so two probes against different sketches can coexist in one plan.
    */
  def bloomMightContain(spark: SparkSession, bc: Broadcast[BloomFilter],
      key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bc))
  }

  /** Column form of the native PQ encoder. The codebook rides as a plain
    * object on the expression (no SQL-literal form), so the Column is built
    * via ColumnBridge like the bloom probe — two encoders with different
    * codebooks coexist in one plan.
    */
  def pqEncode(qe: Column, codebook: Array[Array[Array[Long]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PqEncode(ColumnBridge.expression(qe), codebook))
  }

  /** Column form of the native rolling content hash. Built via
    * ColumnBridge (no registry state, no session parameter), so it drops
    * into any call site — including transform() lambdas, where the child
    * is a lambda variable. */
  def rollingHash31(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(RollingHash31(ColumnBridge.expression(c)))
  }

  /** Column form of the fused portable shingle-hash kernel (r16):
    * rollingHash31 of every 3-token shingle in ONE eval — no shingle
    * strings materialize. `distinct=true` = the minhash path's
    * array_distinct semantics; `distinct=false` = positional (winnowing).
    * Built via ColumnBridge: the boolean flag has no SQL-literal-free
    * registry form worth keeping registry state for. */
  def shingleRolling31(c: Column, distinct: Boolean): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleRolling31(ColumnBridge.expression(c), distinct))
  }

  /** Column form of the native per-query ADC lookup-table builder. */
  def pqAdcLut(qv: Column, codebook: Array[Array[Array[Long]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PqAdcLut(ColumnBridge.expression(qv), codebook))
  }

  /** Column form of the map-side LM scorer; the LM map rides the expression
    * as a plain object (no SQL-literal form), so the Column is built via
    * ColumnBridge like the PQ codebooks. */
  def lmNllSum(lang: Column, bigrams: Column,
      lm: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(LmNllSum(
      ColumnBridge.expression(lang), ColumnBridge.expression(bigrams), lm))
  }
}
