package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.operators.{Chunk, Dedup, Scrub, Sessionize, SetSketch, TextAnalysis}

/** SQL-surface registration for graft's column functions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column
  * API. Most entries are Column COMPOSITIONS (pure Catalyst expression
  * trees — codegen'd, no UDF), bridged into the function registry by
  * building the composed expression from the call's argument expressions;
  * `vec_dot` is the one native expression.
  *
  * Two entry points for the two deployment shapes:
  *  - [[register]]: imperative, on a live session (tests, notebooks);
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` installer for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` /
  *    `.withExtensions(...)` at session build time (spark-submit).
  */
object GraftFunctions {

  private def columnFn(name: String, arity: Int)(
      f: Seq[Column] => Column): (String, Seq[Expression] => Expression) =
    name -> { exprs =>
      require(exprs.length == arity,
        s"$name expects $arity argument(s), got ${exprs.length}")
      GraftColumnBridge.expression(f(exprs.map(GraftColumnBridge.column)))
    }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    columnFn("vec_dot", 2)(cs => VecDot.dot(cs(0), cs(1))),
    columnFn("vec_sq_dist", 2)(cs => VecSqDist.sqDist(cs(0), cs(1))),
    columnFn("vec_cosine", 2)(cs => VectorFunctions.cosine(cs(0), cs(1))),
    columnFn("vec_l2_norm", 1)(cs => VectorFunctions.l2Norm(cs(0))),
    columnFn("vec_l2_dist", 2)(cs => VectorFunctions.l2Distance(cs(0), cs(1))),
    columnFn("quantize_int8", 1)(cs => VectorFunctions.quantizeInt8(cs(0))),
    columnFn("dequant_int8", 2)(cs => VectorFunctions.dequantInt8(cs(0), cs(1))),
    columnFn("token_count", 1)(cs => TextAnalysis.tokenCount(cs(0))),
    columnFn("subword_count", 1)(cs => TextAnalysis.subwordCount(cs(0))),
    columnFn("quality_score", 1)(cs => TextAnalysis.qualityScore(cs(0))),
    columnFn("lang_guess", 1)(cs => TextAnalysis.langGuess(cs(0))),
    columnFn("doc_fingerprint", 1)(cs => TextAnalysis.fingerprint(cs(0))),
    columnFn("char_jaccard", 2)(cs => Dedup.charJaccard(cs(0), cs(1))),
    columnFn("simhash64", 1)(cs => Dedup.simhash64(cs(0))),
    columnFn("redact_pii", 1)(cs => Scrub.redactPii(cs(0))),
    columnFn("dup_token_ratio", 1)(cs => Scrub.duplicateTokenRatio(cs(0))),
    columnFn("winnow_fp", 1)(cs => TextAnalysis.winnowingFingerprints(cs(0))),
    columnFn("poly_hash", 1)(cs => TextAnalysis.polyHash(cs(0))),
    columnFn("soundex_code", 1)(cs => TextAnalysis.soundex(cs(0))),
    columnFn("canonical_url", 1)(cs => Scrub.canonicalUrl(cs(0))),
    columnFn("jaro_winkler", 2)(cs => JaroWinkler.similarity(cs(0), cs(1))),
    columnFn("jaro_sim", 2)(cs => JaroWinkler.jaro(cs(0), cs(1))),
    // aggregate: k must be a foldable literal (it sizes the aggregation
    // buffer, which exists before any row is seen)
    "top_k" -> { exprs =>
      require(exprs.length == 4, s"top_k expects 4 arguments (ord, tie, payload, k), got ${exprs.length}")
      require(exprs(3).foldable, "top_k: k must be a literal")
      val k = exprs(3).eval().asInstanceOf[Number].intValue()
      TopKRows(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), org.apache.spark.sql.types.LongType),
        exprs(2), k).toAggregateExpression()
    },
    // aggregate: exact rational argmax (BigInteger cross-multiplication)
    "rational_argmax" -> { exprs =>
      require(exprs.length == 4,
        s"rational_argmax expects 4 arguments (num, den, tie_a, tie_b), got ${exprs.length}")
      RationalArgMaxAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), org.apache.spark.sql.types.DecimalType(38, 0)),
        exprs(2), exprs(3)).toAggregateExpression()
    },
    // sketch aggregates: precision/capacity are literals for the same
    // reason as top_k's k (they size the aggregation buffer)
    "hll_sketch" -> { exprs =>
      require(exprs.length == 2, s"hll_sketch expects 2 arguments (value, p), got ${exprs.length}")
      require(exprs(1).foldable, "hll_sketch: p must be a literal")
      val p = exprs(1).eval().asInstanceOf[Number].intValue()
      GraftColumnBridge.expression(
        Sketches.hllSketch(GraftColumnBridge.column(exprs(0)), p))
    },
    "hll_merge" -> { exprs =>
      require(exprs.length == 2, s"hll_merge expects 2 arguments (sketch, p), got ${exprs.length}")
      require(exprs(1).foldable, "hll_merge: p must be a literal")
      val p = exprs(1).eval().asInstanceOf[Number].intValue()
      Sketches.HllMergeAgg(exprs(0), p).toAggregateExpression()
    },
    columnFn("hll_estimate", 1)(cs => Sketches.hllEstimate(cs(0))),
    "cm_sketch" -> { exprs =>
      require(exprs.length == 3, s"cm_sketch expects 3 arguments (value, depth, width), got ${exprs.length}")
      require(exprs(1).foldable && exprs(2).foldable, "cm_sketch: depth/width must be literals")
      GraftColumnBridge.expression(Sketches.countMin(
        GraftColumnBridge.column(exprs(0)),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    },
    "cm_merge" -> { exprs =>
      require(exprs.length == 3, s"cm_merge expects 3 arguments (sketch, depth, width), got ${exprs.length}")
      require(exprs(1).foldable && exprs(2).foldable, "cm_merge: depth/width must be literals")
      Sketches.CountMinMergeAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression()
    },
    "cm_query" -> { exprs =>
      require(exprs.length == 3, s"cm_query expects 3 arguments (sketch, probe, depth), got ${exprs.length}")
      require(exprs(2).foldable, "cm_query: depth must be a literal")
      GraftColumnBridge.expression(Sketches.countMinQuery(
        GraftColumnBridge.column(exprs(0)), GraftColumnBridge.column(exprs(1)),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    },
    "qs_sketch" -> { exprs =>
      require(exprs.length == 2, s"qs_sketch expects 2 arguments (value, k), got ${exprs.length}")
      require(exprs(1).foldable, "qs_sketch: k must be a literal")
      GraftColumnBridge.expression(Sketches.quantileSketch(
        GraftColumnBridge.column(exprs(0)),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    },
    "qs_merge" -> { exprs =>
      require(exprs.length == 2, s"qs_merge expects 2 arguments (sketch, k), got ${exprs.length}")
      require(exprs(1).foldable, "qs_merge: k must be a literal")
      Sketches.QuantileSketchMergeAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()
    },
    columnFn("qs_query", 2)(cs => Sketches.quantileSketchQuery(cs(0), cs(1))),
    "freq_items" -> { exprs =>
      require(exprs.length == 2, s"freq_items expects 2 arguments (item, capacity), got ${exprs.length}")
      require(exprs(1).foldable, "freq_items: capacity must be a literal")
      val cap = exprs(1).eval().asInstanceOf[Number].intValue()
      GraftColumnBridge.expression(
        Sketches.freqItems(GraftColumnBridge.column(exprs(0)), cap))
    },
    // stages is a literal string array — it compiles into the LIKE
    // pattern cascade, which must exist before any row is seen
    "funnel_stage" -> { exprs =>
      require(exprs.length == 2, s"funnel_stage expects 2 arguments (types, stages), got ${exprs.length}")
      require(exprs(1).foldable, "funnel_stage: stages must be a literal array")
      val stageArr = exprs(1).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType)
      // a NULL element would NPE inside the LIKE-pattern compile below —
      // reject it here with an analysis-time message instead
      require(!stageArr.contains(null),
        "funnel_stage: stages array must not contain NULL elements")
      val stages = stageArr.map(_.toString).toSeq
      GraftColumnBridge.expression(Sessionize.funnelStageOf(
        GraftColumnBridge.column(exprs(0)), stages))
    },
    "kmv_sketch" -> { exprs =>
      require(exprs.length == 2, s"kmv_sketch expects 2 arguments (key, k), got ${exprs.length}")
      require(exprs(1).foldable, "kmv_sketch: k must be a literal")
      GraftColumnBridge.expression(SetSketch.kmvSketch(
        GraftColumnBridge.column(exprs(0)),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    },
    "kmv_merge" -> { exprs =>
      require(exprs.length == 2, s"kmv_merge expects 2 arguments (kmv, k), got ${exprs.length}")
      require(exprs(1).foldable, "kmv_merge: k must be a literal")
      GraftColumnBridge.expression(SetSketch.kmvMerge(
        GraftColumnBridge.column(exprs(0)),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    },
    "kmv_distinct" -> { exprs =>
      require(exprs.length == 2, s"kmv_distinct expects 2 arguments (kmv, k), got ${exprs.length}")
      require(exprs(1).foldable, "kmv_distinct: k must be a literal")
      GraftColumnBridge.expression(SetSketch.kmvDistinct(
        GraftColumnBridge.column(exprs(0)),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    },
    "content_chunks" -> { exprs =>
      require(exprs.length == 3, s"content_chunks expects 3 arguments (text, divisor, min_len), got ${exprs.length}")
      require(exprs(1).foldable && exprs(2).foldable,
        "content_chunks: divisor/min_len must be literals")
      GraftColumnBridge.expression(Chunk.contentChunksCol(
        GraftColumnBridge.column(exprs(0)),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    },
    "token_windows" -> { exprs =>
      require(exprs.length == 3, s"token_windows expects 3 arguments (text, chunk, overlap), got ${exprs.length}")
      require(exprs(1).foldable && exprs(2).foldable,
        "token_windows: chunk/overlap must be literals")
      GraftColumnBridge.expression(Chunk.tokenWindowsCol(
        GraftColumnBridge.column(exprs(0)),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }

  private[functions] def infos
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo(getClass.getName, name), builder)
    }
}

/** Session-build-time installer (`spark.sql.extensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.infos.foreach(e.injectFunction)
}
