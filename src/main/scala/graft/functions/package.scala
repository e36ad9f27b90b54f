package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Reusable column-level building blocks shared by the enrich operators
  * and the parse (ABI-decode) read path. Everything here is composed from
  * Spark built-ins so it stays inside whole-stage codegen.
  */
package object functions {

  /** `abs(hash(col)) % 10` — the manual hash-bucket partition expression
    * (`/root/reference/dags/templates/evm_load_template.py:219,230,328-329`).
    * CRITICAL: the parse read path must derive buckets with this exact
    * expression so partition pruning stays consistent writer↔reader
    * (Spark Murmur3 semantics; see SURVEY.md §2.7).
    */
  def hashBucket(c: Column, buckets: Int = 10): Column =
    abs(hash(c)) % buckets

  /** Three-way `topics` normalizer
    * (`evm_load_template.py:231-236`): the exporter emits the topics list
    * as (1) a comma-joined string `0xa,0xb`, (2) a JSON array
    * `["0xa","0xb"]`, or (3) a bare single topic `0xa`. Branch-for-branch
    * parity with the reference SQL.
    */
  def topicsArr(topics: Column): Column =
    when(topics.rlike(","),
      when(topics.rlike("^[0-9]+"),
        split(regexp_replace(topics, "\"", ""), ","))
        .otherwise(from_json(topics, ArrayType(StringType))))
      .otherwise(array(topics))

  /** `unhex(substr(col, 3))` — strip the `0x` prefix and decode to binary
    * (`evm_load_template.py:237,326-327,366-367`). */
  def unhex0x(c: Column): Column = unhex(substring(c, 3, Int.MaxValue))

  /** 4-byte call selector `substr(input, 1, 10)` incl. `0x` prefix
    * (`evm_load_template.py:325`). */
  def selector(input: Column): Column = substring(input, 1, 10)

  /** Coinpaprika 5-minute tick → per-minute forward-fill
    * (`/root/reference/dags/offchains/prices.py:73-83`): each source
    * point at minute m yields rows for m..m+4 with the same price. */
  def minuteFanout(minute: Column, minutes: Int = 5): Column =
    explode(sequence(
      minute,
      minute + expr(s"interval ${minutes - 1} minutes"),
      expr("interval 1 minute")))

  /** P6 — token coverage-window guard
    * (`/root/reference/dags/offchains/prices.py:56-59`): keep tokens
    * whose price coverage has not ended before the requested window. */
  def tokenActive(endCol: Column, windowEnd: Column): Column =
    endCol.isNull || endCol >= windowEnd
}
