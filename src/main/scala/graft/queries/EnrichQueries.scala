package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.Tables
import graft.enrich.Enrich
import graft.sources.EvmFixtures
import graft.write.PartitionedWriter

/** The nine reference enrich operators (SURVEY §2.1-2.3, §2.6-2.7) run on
  * EVM-shaped fixtures derived from the testdata; each DuckDB oracle
  * replicates derivation + enrich in plain SQL, so the differential test
  * covers the full operator. Timestamps are emitted as formatted strings
  * or epoch longs (cross-engine-stable); Murmur3 hash-bucket columns are
  * excluded from the enrich oracles' outputs and checked by
  * `q_hash_buckets` — since r10 a FULL cross-engine oracle (DuckDB
  * replays Spark's Murmur3_x86_32 in integer SQL, see [[hashBucketsSql]])
  * — plus the writer↔reader bucket-consistency ScalaTest spec.
  */
object EnrichQueries extends QueryGroup {

  private val fmtTs = "yyyy-MM-dd HH:mm:ss"
  private val duckOrderTs =
    "strftime(date_trunc('second', o_orderdate), '%Y-%m-%d %H:%M:%S')"

  val queries: Seq[Q] = Seq(
    q("q_enrich_blocks", "enrich",
      s"""SELECT $duckOrderTs AS ts_str,
            o_orderkey AS number,
            '0xb' || o_orderkey AS hash,
            '0xp' || o_orderkey AS parent_hash,
            '0xm' || o_custkey AS miner,
            CAST(o_orderkey AS VARCHAR) AS difficulty,
            CAST(o_custkey AS VARCHAR) AS total_difficulty,
            o_orderkey % 1000 AS size,
            o_custkey * 21000 AS gas_used,
            o_orderkey % 100 AS transaction_count,
            o_custkey % 1000000000 AS base_fee_per_gas
          FROM orders""") { (spark, dir) =>
      Enrich.blocks(EvmFixtures.blocks(Tables.df(spark, dir, "orders")))
        .select(
          date_format(col("timestamp"), fmtTs).as("ts_str"),
          col("number"), col("hash"), col("parent_hash"), col("miner"),
          col("difficulty").cast("string").as("difficulty"),
          col("total_difficulty").cast("string").as("total_difficulty"),
          col("size"),
          col("gas_used"), col("transaction_count"), col("base_fee_per_gas"))
    },

    q("q_enrich_transactions", "enrich",
      s"""WITH li AS (
            SELECT l_orderkey, l_linenumber,
                   min(l_partkey) AS l_partkey, min(l_suppkey) AS l_suppkey
            FROM lineitem GROUP BY l_orderkey, l_linenumber)
          SELECT '0xt' || l_orderkey || '_' || l_linenumber AS hash,
            CAST(l_linenumber AS BIGINT) AS nonce,
            CAST(l_linenumber AS BIGINT) AS transaction_index,
            '0xf' || l_suppkey AS from_address,
            '0xa' || l_partkey AS to_address,
            CAST(l_partkey AS VARCHAR) AS value,
            l_partkey AS gas,
            l_suppkey AS gas_price,
            '0x' || lpad(hex(l_partkey), 8, '0')
                 || lpad(hex(l_suppkey), 64, '0') AS input,
            l_partkey + l_suppkey AS receipt_cumulative_gas_used,
            l_partkey AS receipt_gas_used,
            CASE WHEN l_linenumber = 1 THEN '0xn' || l_partkey END
              AS receipt_contract_address,
            '0x0' AS receipt_root,
            CAST(l_linenumber % 2 AS BIGINT) AS receipt_status,
            $duckOrderTs AS block_timestamp,
            l_orderkey AS block_number,
            '0xb' || l_orderkey AS block_hash,
            l_suppkey * 2 AS max_fee_per_gas,
            l_suppkey AS max_priority_fee_per_gas,
            CAST(l_linenumber % 3 AS BIGINT) AS transaction_type,
            l_suppkey AS receipt_effective_gas_price
          FROM li JOIN orders ON l_orderkey = o_orderkey""") {
      (spark, dir) =>
        val li = Tables.df(spark, dir, "lineitem")
        val o = Tables.df(spark, dir, "orders")
        Enrich.transactions(
            EvmFixtures.transactions(li), EvmFixtures.blocks(o),
            EvmFixtures.receipts(li))
          .withColumn("block_timestamp",
            date_format(col("block_timestamp"), fmtTs))
          .withColumn("value", col("value").cast("string"))
    },

    q("q_enrich_contracts", "enrich",
      s"""SELECT '0xc' || o_custkey AS address,
            '0x60806040' AS bytecode,
            '0x06fdde03,0x95d89b41' AS function_sighashes,
            (o_orderkey % 2 = 0) AS is_erc20,
            (o_orderkey % 3 = 0) AS is_erc721,
            $duckOrderTs AS block_timestamp,
            o_orderkey AS block_number,
            '0xb' || o_orderkey AS block_hash
          FROM orders""") { (spark, dir) =>
      val o = Tables.df(spark, dir, "orders")
      Enrich.contracts(EvmFixtures.contracts(o), EvmFixtures.blocks(o))
        .withColumn("block_timestamp",
          date_format(col("block_timestamp"), fmtTs))
    },

    q("q_enrich_token_transfers", "enrich",
      s"""SELECT '0xk' || l_partkey AS token_address,
            '0xf' || l_suppkey AS from_address,
            '0xa' || (l_partkey % 97) AS to_address,
            CAST(CAST(floor(l_extendedprice) AS DECIMAL(38,0)) AS VARCHAR)
              AS value,
            '0xt' || l_orderkey || '_' || l_linenumber AS transaction_hash,
            CAST(l_linenumber AS BIGINT) AS log_index,
            $duckOrderTs AS block_timestamp,
            l_orderkey AS block_number,
            '0xb' || l_orderkey AS block_hash
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey""") {
      (spark, dir) =>
        val li = Tables.df(spark, dir, "lineitem")
        val o = Tables.df(spark, dir, "orders")
        Enrich.tokenTransfers(EvmFixtures.tokenTransfers(li),
            EvmFixtures.blocks(o))
          .withColumn("block_timestamp",
            date_format(col("block_timestamp"), fmtTs))
          .withColumn("value", col("value").cast("string"))
    },

    q("q_enrich_logs", "enrich",
      """WITH logs AS (
           SELECT event_id, user_id,
             CASE WHEN event_id % 3 = 0 THEN
                    ('0xe' || (user_id % 7)) || ',' || ('0xd' || (event_id % 5))
                  WHEN event_id % 3 = 1 THEN
                    '["' || ('0xe' || (user_id % 7)) || '","'
                         || ('0xd' || (event_id % 5)) || '"]'
                  ELSE '0xe' || (user_id % 7) END AS topics,
             '0x' || lpad(hex(event_id), 64, '0') AS data
           FROM events)
         SELECT event_id AS log_index,
           '0xt' || event_id AS transaction_hash,
           '0xa' || (user_id % 97) AS address,
           CASE WHEN NOT contains(topics, ',') THEN topics
                WHEN regexp_matches(topics, '^[0-9]+')
                  THEN string_split(replace(topics, '"', ''), ',')[1]
                ELSE json_extract_string(topics, '$[0]') END AS selector,
           CAST(CASE WHEN NOT contains(topics, ',') THEN 1
                WHEN regexp_matches(topics, '^[0-9]+')
                  THEN len(string_split(replace(topics, '"', ''), ','))
                ELSE json_array_length(topics) END AS BIGINT) AS n_topics,
           CAST(octet_length(unhex(substr(data, 3))) AS BIGINT) AS data_len,
           user_id AS block_number,
           user_id * 1000 + 1600000000 AS block_ts
         FROM logs""") { (spark, dir) =>
      val ev = Tables.df(spark, dir, "events")
      Enrich.logs(EvmFixtures.logs(ev), EvmFixtures.blocksForLogs(ev))
        .select(
          col("log_index"), col("transaction_hash"), col("address"),
          col("selector"),
          size(col("topics_arr")).cast(LongType).as("n_topics"),
          length(col("unhex_data")).cast(LongType).as("data_len"),
          col("block_number"),
          unix_timestamp(col("block_timestamp")).as("block_ts"))
    },

    q("q_enrich_traces", "enrich",
      s"""SELECT
            CASE WHEN l_linenumber % 7 <> 0
              THEN '0xt' || l_orderkey || '_' || l_linenumber END
              AS transaction_hash,
            CAST(l_linenumber AS BIGINT) AS transaction_index,
            '0xf' || l_suppkey AS from_address,
            '0xa' || l_partkey AS to_address,
            CAST(l_suppkey AS VARCHAR) AS value,
            '0x' || lpad(hex(l_partkey % 16), 8, '0') AS selector,
            CAST(4 + 32 AS BIGINT) AS input_len,
            CAST(32 AS BIGINT) AS output_len,
            CASE WHEN l_linenumber % 3 = 0 THEN '[]'
                 ELSE '[' || (l_linenumber % 3) || ']' END AS trace_address,
            'call_' || l_orderkey || '_' || l_linenumber AS trace_id,
            CASE WHEN l_linenumber % 2 = 0 THEN 'call'
                 ELSE 'delegatecall' END AS call_type,
            CAST(l_linenumber % 4 AS BIGINT) AS subtraces,
            l_orderkey AS block_number,
            $duckOrderTs AS block_timestamp
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey""") {
      (spark, dir) =>
        val li = Tables.df(spark, dir, "lineitem")
        val o = Tables.df(spark, dir, "orders")
        Enrich.traces(EvmFixtures.traces(li), EvmFixtures.blocks(o))
          .select(
            col("transaction_hash"), col("transaction_index"),
            col("from_address"), col("to_address"),
            col("value").cast("string").as("value"),
            col("selector"),
            length(col("unhex_input")).cast(LongType).as("input_len"),
            length(col("unhex_output")).cast(LongType).as("output_len"),
            col("trace_address"), col("trace_id"), col("call_type"),
            col("subtraces"), col("block_number"),
            date_format(col("block_timestamp"), fmtTs).as("block_timestamp"))
    },

    q("q_enrich_geth_traces", "enrich",
      s"""SELECT
            '0xt' || l_orderkey || '_' || l_linenumber AS transaction_hash,
            CAST(l_linenumber AS BIGINT) AS transaction_index,
            '0xf' || l_suppkey AS from_address,
            '0xa' || l_partkey AS to_address,
            '0x' || lpad(hex(l_partkey % 16), 8, '0') AS selector,
            CASE WHEN l_linenumber % 3 = 0 THEN '[]'
                 ELSE '[' || (l_linenumber % 3) || ']' END AS trace_address,
            l_orderkey AS block_number,
            $duckOrderTs AS block_timestamp
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey""") {
      (spark, dir) =>
        val li = Tables.df(spark, dir, "lineitem")
        val o = Tables.df(spark, dir, "orders")
        Enrich.gethTraces(EvmFixtures.traces(li), EvmFixtures.blocks(o),
            EvmFixtures.transactions(li))
          .select(
            col("transaction_hash"), col("transaction_index"),
            col("from_address"), col("to_address"), col("selector"),
            col("trace_address"), col("block_number"),
            date_format(col("block_timestamp"), fmtTs).as("block_timestamp"))
    },

    q("q_tokens_incremental", "enrich",
      """WITH staged AS (
           SELECT '0xk' || p_partkey AS address,
                  p_brand AS symbol, p_name AS name,
                  CAST(p_size % 19 AS VARCHAR) AS decimals,
                  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR)
                    AS total_supply,
                  p_partkey
           FROM part)
         SELECT address, symbol, name, decimals, total_supply
         FROM staged WHERE p_partkey % 3 <> 0""") { (spark, dir) =>
      val part = Tables.df(spark, dir, "part")
      val staged = EvmFixtures.tokensStaged(part)
      val existing =
        EvmFixtures.tokensStaged(part.filter(col("p_partkey") % 3 === 0))
      Enrich.tokensIncremental(staged, existing)
    },

    // the prices enrich projection itself (`evm_load_template.py:
    // 246-257`): staged 6-column day table → the 5 price columns, the
    // staging dt dropped. r12 verdict gap #3: this leg rode only on
    // PipelineSpec + the fan-out oracle before; now it has its own
    // hash row like the other eight resources
    q("q_enrich_prices", "enrich",
      """SELECT strftime(date_trunc('minute', ts),
              '%Y-%m-%d %H:%M:%S') AS minute,
            (event_id % 500) / 4.0 AS price,
            user_id % 18 AS decimals,
            '0xk' || user_id AS contract_address,
            'SYM' || (event_id % 50) AS symbol
          FROM events""") { (spark, dir) =>
      Enrich.prices(EvmFixtures.pricesStaged(Tables.df(spark, dir, "events")))
        .withColumn("minute", date_format(col("minute"), fmtTs))
    },

    // the tokens APPEND leg (`evm_load_template.py:281-297`, S5): the
    // incremental selection feeding the real append sink, twice — the
    // second replay selects nothing against the now-complete table, so
    // the final warehouse state proves both the projection and the
    // append idempotence contract. Oracle = the full staged set
    // (existing ∪ newly-appended = every token, each exactly once)
    q("q_enrich_tokens_append", "enrich",
      """SELECT '0xk' || p_partkey AS address,
            p_brand AS symbol, p_name AS name,
            CAST(p_size % 19 AS VARCHAR) AS decimals,
            CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR)
              AS total_supply
          FROM part""") { (spark, dir) =>
      val part = Tables.df(spark, dir, "part")
      val cols = Seq("address", "symbol", "name", "decimals",
        "total_supply")
      val staged = EvmFixtures.tokensStaged(part)
      val out = tmpDir("graft_tokens")
      // day 0: the pre-existing tokens table (every third token)
      PartitionedWriter.append(
        EvmFixtures.tokensStaged(part.filter(col("p_partkey") % 3 === 0))
          .select(cols.map(col): _*), out)
      // day 1: append only the genuinely new addresses
      PartitionedWriter.append(
        Enrich.tokensIncremental(staged, spark.read.parquet(out)), out)
      // day 1 re-run: EXCEPT against the complete table selects
      // nothing — the reference's INSERT INTO stays idempotent
      PartitionedWriter.append(
        Enrich.tokensIncremental(staged, spark.read.parquet(out)), out)
      spark.read.parquet(out)
    },

    q("q_prices_fanout", "enrich",
      """SELECT event_id, strftime(m, '%Y-%m-%d %H:%M:%S') AS minute, value
         FROM (SELECT event_id, value,
                 unnest(generate_series(date_trunc('minute', ts),
                   date_trunc('minute', ts) + INTERVAL 4 MINUTE,
                   INTERVAL 1 MINUTE)) AS m
               FROM events) t""") { (spark, dir) =>
      Tables.df(spark, dir, "events")
        .select(col("event_id"),
          graft.functions.minuteFanout(date_trunc("minute", col("ts")))
            .as("minute"),
          col("value"))
        .withColumn("minute", date_format(col("minute"), fmtTs))
    },

    // P6 — token coverage-window guard (`prices.py:56-59`): a token is
    // price-fetchable when its coverage end is open (null) or extends to
    // the requested window end. Tokens modeled from `part` with a
    // synthetic epoch-long coverage end; every third token open-ended.
    q("q_token_coverage_guard", "enrich",
      """SELECT token_id, coverage_end FROM (
           SELECT p_partkey AS token_id,
                  CASE WHEN p_partkey % 3 = 0 THEN NULL
                       ELSE 1600000000 + p_partkey * 1000 END AS coverage_end
           FROM part) t
         WHERE coverage_end IS NULL OR coverage_end >= 1605000000""") {
      (spark, dir) =>
      val tokens = Tables.df(spark, dir, "part")
        .select(col("p_partkey").as("token_id"),
          when(col("p_partkey") % 3 === 0, lit(null).cast(LongType))
            .otherwise(lit(1600000000L) + col("p_partkey") * 1000L)
            .as("coverage_end"))
      tokens.filter(graft.functions.tokenActive(col("coverage_end"),
        lit(1605000000L)))
    },

    // Murmur3 hash buckets, FULLY oracled since r10: the bucket is
    // abs(murmur3_x86_32(utf8_bytes, seed 42)) % 10, and Spark's
    // Murmur3 variant (little-endian 4-byte words, then each TAIL byte
    // mixed individually — unlike reference murmur3's combined tail —
    // then fmix with the byte length) is plain 32-bit integer
    // arithmetic, so DuckDB replays it exactly: words/tail as list
    // comprehensions over ord(), the k1 pipeline as staged
    // list_transforms, the h1 chain as a seed-prepended list_reduce,
    // wrap-around multiplies via HUGEINT % 2^32 and rotations as
    // shift-add on BIGINT. Fixture strings are pure ASCII, so ord() =
    // byte value = Java's (signed) byte. The spec-tested
    // writer↔reader consistency contract is unchanged; this adds
    // cross-engine value equality on top.
    q("q_hash_buckets", "enrich", hashBucketsSql) { (spark, dir) =>
      val ev = Tables.df(spark, dir, "events")
      Enrich.logs(EvmFixtures.logs(ev), EvmFixtures.blocksForLogs(ev))
        .groupBy(col("address_hash"), col("selector_hash"))
        .agg(count(lit(1)).as("cnt"))
    })

  /** DuckDB replay of Spark's Murmur3_x86_32 hash-bucketing over the
    * logs fixture strings (addresses `0xa{user_id%97}`, selectors
    * `0xe{user_id%7}` — 104 distinct ASCII strings, hashed once each,
    * joined back to the per-row stream for the bucket counts).
    * Constants: C1 0xcc9e2d51 = 3432918353, C2 0x1b873593 = 461845907,
    * mixH1 addend 0xe6546b64 = 3864292196, fmix 0x85ebca6b = 2246822507
    * and 0xc2b2ae35 = 3266489909; rotl(x,r) on a [0,2^32) value is
    * (x·2^r) % 2^32 + x // 2^(32−r) (disjoint bits, so + is |). The
    * abs() edge (hash = Int.MinValue stays negative, % keeps the
    * dividend sign) is mimicked branch-for-branch. */
  private def hashBucketsSql: String =
    s"""WITH rows_ AS (
         SELECT '0xa' || CAST(user_id % 97 AS VARCHAR) AS a_s,
                '0xe' || CAST(user_id % 7 AS VARCHAR) AS s_s
         FROM events),
       strs AS (SELECT a_s AS s FROM rows_ UNION SELECT s_s FROM rows_),
       ${MurmurSql.chain},
       bk AS (SELECT s,
                CAST((CASE WHEN sg = -2147483648 THEN sg ELSE abs(sg) END)
                  % 10 AS INTEGER) AS bucket
              FROM (SELECT s, CASE WHEN u >= 2147483648
                                   THEN u - 4294967296 ELSE u END AS sg
                    FROM mm) t)
       SELECT ab.bucket AS address_hash, sb.bucket AS selector_hash,
              count(*) AS cnt
       FROM rows_ r JOIN bk ab ON r.a_s = ab.s
                    JOIN bk sb ON r.s_s = sb.s
       GROUP BY 1, 2"""
}
