package graft.queries

/** Shared DuckDB replay of Spark's Murmur3_x86_32 (seed 42) — the
  * spelling proven by `q_hash_buckets` and the Bloom decontaminator,
  * kept in ONE place because the hash SQL is correctness-critical
  * (four divergeable copies is how a replay drifts).
  *
  * Two front-ends over one mixing core [[mix]]:
  *   - [[chain]]: hash of a STRING column — splice after a CTE
  *     `strs(s)` (one row per DISTINCT string); yields `mm(s, u)`.
  *   - [[chainLong]]: Spark's `hash(BIGINT)` — the value split into
  *     two little-endian 32-bit words, byte length 8; splice after a
  *     CTE `ids(<key>)` of DISTINCT NON-NEGATIVE longs; yields
  *     `mm(<key>, u)`.
  * `u` is the UNSIGNED 32-bit hash (Spark probes
  * `hash(x) & 0xFFFFFFFF`); re-sign with
  * `CASE WHEN u >= 2147483648 THEN u - 4294967296 ELSE u END`.
  *
  * ASCII-ONLY CONTRACT (string form): `ord()`/`length()`/`s[i]` index
  * CODEPOINTS, Spark hashes UTF-8 BYTES — the two agree only on
  * ASCII. Every current caller hashes fixture addresses/selectors or
  * space-split tokens of the synthetic ASCII corpus; a non-ASCII
  * corpus would need a byte-level `bs` CTE (encode() + octet walk)
  * before [[mix]].
  *
  * Arithmetic: every product stays below 2⁶³ except the three 32-bit
  * multiplies, which widen through HUGEINT — plain BIGINT arithmetic
  * everywhere else replays the Scala exactly. */
object MurmurSql {

  /** Mixing core `k1, k2, k3, hb, f0..f4, mm` — expects an upstream
    * CTE `it(<key>, n, items)` where `items` is the little-endian
    * 32-bit word list (tail bytes appended singly) and `n` the BYTE
    * length folded into fmix. */
  def mix(key: String): String =
    s"""k1 AS (SELECT $key, n, list_transform(items, w ->
                CAST((CAST(w AS HUGEINT) * 3432918353) % 4294967296
                  AS BIGINT)) AS ks FROM it),
       k2 AS (SELECT $key, n, list_transform(ks, k ->
                (k * 32768) % 4294967296 + k // 131072) AS ks FROM k1),
       k3 AS (SELECT $key, n, list_transform(ks, k ->
                CAST((CAST(k AS HUGEINT) * 461845907) % 4294967296
                  AS BIGINT)) AS ks FROM k2),
       hb AS (SELECT $key, n,
                list_reduce(list_prepend(CAST(42 AS BIGINT), ks),
                  (h, k) -> (((xor(h, k) * 8192) % 4294967296
                              + xor(h, k) // 524288) * 5
                             + 3864292196) % 4294967296) AS raw
              FROM k3),
       f0 AS (SELECT $key, xor(raw, n) AS h FROM hb),
       f1 AS (SELECT $key, xor(h, h // 65536) AS h FROM f0),
       f2 AS (SELECT $key, CAST((CAST(h AS HUGEINT) * 2246822507)
                % 4294967296 AS BIGINT) AS h FROM f1),
       f3 AS (SELECT $key, xor(h, h // 8192) AS h FROM f2),
       f4 AS (SELECT $key, CAST((CAST(h AS HUGEINT) * 3266489909)
                % 4294967296 AS BIGINT) AS h FROM f3),
       mm AS (SELECT $key, xor(h, h // 65536) AS u FROM f4)"""

  /** CTE chain `b, it, k1…mm` for a string column — splice after a
    * `strs` CTE: `s"WITH strs AS (...), ${MurmurSql.chain}, ..."`. */
  val chain: String =
    """b AS (SELECT s, length(s) AS n,
               [ord(s[i]) for i in generate_series(1, length(s))] AS bs
             FROM strs),
       it AS (SELECT s, n,
                list_concat(
                  [bs[4*j+1] + 256*bs[4*j+2] + 65536*bs[4*j+3]
                     + 16777216*bs[4*j+4]
                   for j in generate_series(0, n//4 - 1)],
                  bs[4*(n//4)+1 : n]) AS items
              FROM b),
       """ + mix("s")

  /** CTE chain `it, k1…mm` for Spark's `hash(BIGINT)` — splice after
    * an `ids(<key>)` CTE of distinct non-negative longs. */
  def chainLong(key: String): String =
    s"""it AS (SELECT $key, 8 AS n,
                 [$key % 4294967296, $key // 4294967296] AS items
               FROM ids),
       """ + mix(key)
}
