package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType|DoubleType)` columns.
  *
  * Built from Spark's higher-order functions (`zip_with`, `aggregate`) —
  * these stay inside whole-stage codegen, need no UDF serialization, and
  * work per-row with zero shuffle. All arithmetic is forced to DOUBLE so
  * results are bit-comparable with a DuckDB oracle computing over
  * `CAST(embedding AS DOUBLE[])` (both engines then fold left-to-right in
  * double precision).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision — a native codegen expression ([[VecDot]]);
    * the `zip_with`+`aggregate` equivalent is ~20× slower in pairwise joins. */
  def dot(a: Column, b: Column): Column = VecDot.dot(a, b)

  /** ‖a‖₂ in double precision. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean distance in double precision. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Symmetric per-vector int8 quantization — 4× storage cut for ANN
    * shortlists and embedding lakes. Returns `struct(scale double,
    * q array<int>)` with `qᵢ = floor(vᵢ·127/maxAbs + 0.5)` (round half
    * up, |qᵢ| ≤ 127 — the fp error of the two roundings cannot reach the
    * +0.5 needed for 128) and `scale = maxAbs/127`, so `qᵢ·scale`
    * reconstructs within `scale/2` per element. All-zero vectors quantize
    * to zeros with scale 0 — exact reconstruction; empty vectors yield an
    * empty `q` with null scale (no data to scale).
    *
    * Every step is per-row IEEE double arithmetic in a fixed order, so a
    * DuckDB oracle reproduces the quantized integers BIT-EXACTLY (q69).
    * `maxAbs` is let-bound through a one-element `transform` — referencing
    * it directly inside the per-element lambda would recompute the O(d)
    * max per element, O(d²) per row (the Scrub.wordNgrams lesson). */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    get(
      transform(array(maxAbs), ma =>
        struct(
          (ma / lit(127.0)).as("scale"),
          transform(v, x =>
            when(ma === lit(0.0), lit(0))
              .otherwise(floor(x.cast("double") * lit(127.0) / ma + lit(0.5))
                .cast("int"))).as("q"))),
      lit(0))
  }

  /** Inverse of [[quantizeInt8]]: `qᵢ·scale` as double. */
  def dequantInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Johnson–Lindenstrauss sign random projection (the database-friendly
    * JL of Achlioptas 2003: entries ±1 preserve pairwise inner products in
    * expectation with variance ~‖a‖²‖b‖²/outDims):
    * `out_k = (Σ_j v_j · s_{j,k}) / √outDims`, the standard cheap
    * dimensionality cut before ANN indexing / near-dup banding when the
    * embedding width is the cost driver.
    *
    * The sign matrix is DERIVED, not sampled: `s_{j,k} = +1 iff the first
    * hex digit of md5("j:k:domain") < '8'` — data-independent, no RNG
    * state, no weight table to ship, and any engine rederives it exactly
    * (the q117 oracle recomputes the same md5 bit). The matrix is
    * evaluated at PLAN BUILD TIME into literal ±1 arrays, so per-row work
    * is `inDims·outDims` fused mul-adds — zero hashing in the hot path,
    * zero shuffle, pipelines with the scan.
    *
    * Determinism: per-row fixed-order IEEE arithmetic — each output
    * element folds `v_j·s_{j,k}` in ascending `j` from an exact 0.0 init,
    * then one correctly-rounded √outDims division. Bit-identical
    * cross-engine; no rounding needed.
    *
    * Vectors must carry exactly `inDims` elements: a shorter vector
    * null-pads through `zip_with` and yields null output elements (they
    * poison downstream dots loudly rather than silently truncating). */
  def randomProjectSigns(v: Column, inDims: Int, outDims: Int,
                         domain: String = "jl"): Column = {
    require(inDims >= 1 && inDims <= 65536,
      s"inDims ($inDims) must be in [1, 65536]")
    require(outDims >= 1 && outDims <= 4096,
      s"outDims ($outDims) must be in [1, 4096]")
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // divide (not multiply-by-reciprocal): a reciprocal rounds twice and
    // the oracle's literal `/ sqrt(k)` would diverge in the last ulp
    val root = sqrt(lit(outDims.toDouble))
    val cols = (0 until outDims).map { k =>
      val signs = array((0 until inDims).map { j =>
        lit(if (md5hex(s"$j:$k:$domain").head < '8') 1.0 else -1.0)
      }: _*)
      aggregate(
        zip_with(v, signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, t) => acc + t) / root
    }
    array(cols: _*)
  }
}
