package graft.queries

/** Shared DuckDB replay of Spark's Murmur3_x86_32(utf8 bytes, seed 42)
  * over a string column — the spelling proven by `q_hash_buckets` and
  * the Bloom decontaminator. [[chain]] emits the CTE text from an
  * upstream CTE `strs(s)` (one row per DISTINCT string) to `mm(s, u)`
  * where `u` is the UNSIGNED 32-bit hash (Spark probes
  * `hash(x) & 0xFFFFFFFF`). Every product stays below 2⁶³ except the
  * three 32-bit multiplies, which widen through HUGEINT — plain
  * BIGINT arithmetic everywhere else replays the Scala exactly. */
object MurmurSql {

  /** CTE chain `b, it, k1, k2, k3, hb, f0..f4, mm` — splice after a
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
       k1 AS (SELECT s, n, list_transform(items, w ->
                CAST((CAST(w AS HUGEINT) * 3432918353) % 4294967296
                  AS BIGINT)) AS ks FROM it),
       k2 AS (SELECT s, n, list_transform(ks, k ->
                (k * 32768) % 4294967296 + k // 131072) AS ks FROM k1),
       k3 AS (SELECT s, n, list_transform(ks, k ->
                CAST((CAST(k AS HUGEINT) * 461845907) % 4294967296
                  AS BIGINT)) AS ks FROM k2),
       hb AS (SELECT s, n,
                list_reduce(list_prepend(CAST(42 AS BIGINT), ks),
                  (h, k) -> (((xor(h, k) * 8192) % 4294967296
                              + xor(h, k) // 524288) * 5
                             + 3864292196) % 4294967296) AS raw
              FROM k3),
       f0 AS (SELECT s, xor(raw, n) AS h FROM hb),
       f1 AS (SELECT s, xor(h, h // 65536) AS h FROM f0),
       f2 AS (SELECT s, CAST((CAST(h AS HUGEINT) * 2246822507)
                % 4294967296 AS BIGINT) AS h FROM f1),
       f3 AS (SELECT s, xor(h, h // 8192) AS h FROM f2),
       f4 AS (SELECT s, CAST((CAST(h AS HUGEINT) * 3266489909)
                % 4294967296 AS BIGINT) AS h FROM f3),
       mm AS (SELECT s, xor(h, h // 65536) AS u FROM f4)"""
}
