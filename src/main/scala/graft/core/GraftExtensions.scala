package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom Catalyst expressions — the
  * `SparkSessionExtensions` registration that makes every codegen'd
  * operator primitive reachable from `spark.sql(...)`, not just the
  * Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).…
  * spark.sql("SELECT simhash64(split(text, ' ')) FROM docs")
  * }}}
  *
  * Registered (arity-checked at analysis, same Expressions the Column
  * API builds — one implementation, two surfaces):
  *  - `simhash64(array<string>) → bigint`
  *  - `rolling_hash64(string) → bigint` (document fingerprint)
  *  - `minhash_array(array<string>, k) → array<bigint>` (k literal)
  *  - `rolling_window_hash(array<bigint>, w) → array<bigint>` (w literal)
  *  - `dot_product_fold(array<float|double|int>, …) → double`
  *  - `abi_decode_event(topics, data, '<abi json>') → struct` (json literal)
  *  - `abi_decode_call(input, output, '<abi json>') → struct`
  *
  * NOT registered: `BloomProbe` — its bitset is a driver-built runtime
  * object, not a literal a SQL call site can spell; build it through
  * [[graft.ops.Decontaminate.bloomFlag]].
  *
  * For sessions that already exist (the driver builds Verify/Bench
  * sessions itself, where `withExtensions` is out of reach),
  * [[GraftSession.tune]] injects the same builders into the live
  * session's function registry — both paths share [[registrations]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  private def litInt(fn: String, arg: String, e: Expression): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval(null) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal integer, got $other")
    }
  }

  private def arity(fn: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$fn expects $n arguments, got ${args.length}")
      build(args)
    }

  /** (identifier, info, builder) triples — the single registration
    * list both injection paths consume. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = {
    // 3-arg ExpressionInfo: the richer constructors validate `group` /
    // `source` against Spark-internal whitelists — not worth coupling to
    def reg(name: String, n: Int, usage: String)(
        build: Seq[Expression] => Expression) =
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.core.GraftExtensions", null, name),
        arity(name, n)(build))
    Seq(
      reg("simhash64", 1,
        "simhash64(tokens) - 64-bit SimHash over a token array") {
        case Seq(c) => graft.ops.SimHash64(c)
      },
      reg("rolling_hash64", 1,
        "rolling_hash64(text) - rolling-polynomial 64-bit fingerprint") {
        case Seq(c) => graft.ops.RollingHash64(c)
      },
      reg("nfc_normalize", 1,
        "nfc_normalize(text) - Unicode NFC canonical normalization") {
        case Seq(c) => graft.functions.NfcNormalize(c)
      },
      reg("minhash_array", 2,
        "minhash_array(shingles, k) - k-seed MinHash signature") {
        case Seq(c, k) =>
          graft.ops.MinHashArray(c, litInt("minhash_array", "k", k))
      },
      reg("rolling_window_hash", 2,
        "rolling_window_hash(hashes, w) - w-gram rolling window hashes") {
        case Seq(c, w) =>
          graft.ops.RollingWindowHash(c,
            litInt("rolling_window_hash", "w", w))
      },
      reg("dot_product_fold", 2,
        "dot_product_fold(a, b) - elementwise dot product fold") {
        case Seq(a, b) => graft.functions.DotProductFold(a, b)
      },
      reg("abi_decode_event", 3,
        "abi_decode_event(topics, data, abi_json) - decode an EVM log") {
        case Seq(t, d, j) => graft.abi.AbiDecodeEvent(t, d, j)
      },
      reg("abi_decode_call", 3,
        "abi_decode_call(input, output, abi_json) - decode an EVM call") {
        case Seq(i, o, j) => graft.abi.AbiDecodeCall(i, o, j)
      })
  }

  /** Inject into a LIVE session's function registry (the post-build
    * path `withExtensions` cannot serve). Idempotent: re-registration
    * overwrites with identical builders. */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftColumnBridge
        .registerFunction(spark, id, info, builder)
    }
}
