package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Load-time cast of raw (string-typed) columns into a reference-shaped
  * warehouse schema, in the engine's two documented overflow modes
  * (round-8 verdict #3):
  *
  *  - STRICT (default): plain `cast` under Spark 4 ANSI semantics — an
  *    over-range value (a uint256 past DECIMAL(38,0)'s 38 digits)
  *    RAISES at load. This is the engine's parity mode: data loss is an
  *    error, not a silent NULL.
  *  - PERMISSIVE: `try_cast` — over-range values load as NULL, which is
  *    bit-for-bit the reference's actual runtime behavior: its Hive-mode
  *    `CAST(value AS DECIMAL(38,0))` load silently nulls overflow
  *    (`/root/reference/dags/templates/evm_load_template.py:17-18`
  *    declares DECIMAL(38,0) for fields fed from uint256 exports).
  *    Opt in only when replaying a reference warehouse byte-for-byte;
  *    new pipelines should keep strict mode (or carry uint256 as the
  *    full-precision string, as [[graft.enrich.Enrich]] does).
  *
  * Columns the target schema does not declare pass through untouched;
  * declared-but-absent columns are ignored (the raw readers in
  * [[graft.sources.RawTableReader]] apply schemas on read, so this is
  * for frames assembled from other sources).
  */
object LoadCast {
  def toReferenceShape(df: DataFrame, schema: StructType,
      permissive: Boolean = false): DataFrame = {
    // case-INSENSITIVE name match, like Spark's default column
    // resolution: a raw export with 'Value' against a schema declaring
    // 'value' must still be cast — a case-sensitive miss here would
    // silently skip the cast AND strict mode's overflow raise, the
    // exact failure this class exists to prevent
    val declared = schema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    df.select(df.columns.map { c =>
      declared.get(c.toLowerCase) match {
        case Some(t) if df.schema(c).dataType != t =>
          (if (permissive) col(c).try_cast(t) else col(c).cast(t)).as(c)
        case _ => col(c)
      }
    }.toIndexedSeq: _*)
  }
}
