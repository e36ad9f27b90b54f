package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Checkpoints, GraftSession}

/** Link-graph centrality for corpus curation: PageRank over a
  * domain/document link graph is the classic web-scale quality prior
  * (the public PageRank formulation, Brin & Page 1998 — used by
  * Common-Crawl-derived corpora to weight or gate domains before text
  * filters ever run).
  *
  * This is the FIXED-POINT INTEGER variant: ranks are scaled longs
  * (`scale` total mass units at seed), every division is a floor
  * division, and iteration count is fixed — so the result is exactly
  * reproducible on any engine (the oracle replays all iterations as a
  * recursive CTE; a libm-double PageRank would drift in the last ulp
  * across engines and summation orders). Floor truncation loses a few
  * mass units per node per round — irrelevant for ranking/weighting
  * (relative order is preserved at `scale` ≫ n) and the price of
  * engine-exactness, the same trade [[TextAnalysis.bigramLmScore]]
  * makes.
  *
  * Scale shape per iteration: one equi-join of the edge list with the
  * current rank table on the source id, then ONE partial-agg'd hash
  * aggregate over the union of the damped shares and the |V| teleport
  * seed rows — the aggregate closes the round, so there is no
  * per-round outer join and no per-round second broadcast build (r20;
  * the union rows carry (share, 0) / (0, base) and fold as
  * max(base) + d·Σshare div 100, bit-identical to the outer-join
  * spelling) — all linear in |E| + |V|. Out-degrees are joined ONCE onto the
  * edge list before the loop (they never change) and the rank table is
  * rotating-localCheckpointed each round, so executor storage holds two
  * |V|-sized copies at any moment (not `iterations`) and the logical
  * plan stays O(1) deep. Dangling nodes (no out-edges) simply leak
  * their damped mass — the standard simplification; ranks remain a
  * valid centrality order.
  */
object Graph {

  /** @param edges     distinct directed edges (self-loops and duplicate
    *                  edges should be removed by the caller — each row
    *                  carries one unit of out-share)
    * @param iterations fixed power-iteration count (8 ≈ converged for
    *                  ranking purposes on web-shaped graphs)
    * @param dampingPct damping factor in percent (the public 0.85)
    * @param scale     total mass in integer units at seed
    * @param nodesOpt  explicit node universe (one column); defaults to
    *                  the ids appearing in the edge list — pass it when
    *                  isolated nodes must still receive teleport mass
    * @param nNodesOpt precomputed `nodesOpt.count()` — pass it when the
    *                  caller already counted the universe, so the seed
    *                  mass split doesn't re-run a corpus COUNT job
    * @return (node, rank) — rank in integer mass units. The returned
    *         frame IS the final round's local checkpoint (|V| rows of
    *         executor-resident data, O(1)-deep plan); every
    *         intermediate round, the node universe and the
    *         degree-folded edge list are unpersisted before return. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8, dampingPct: Int = 85,
      scale: Long = 1000000L, nodesOpt: Option[DataFrame] = None,
      nNodesOpt: Option[Long] = None): DataFrame = {
    val (nodes, eDeg, p, nNodes) =
      prepare(edges, srcCol, dstCol, nodesOpt, nNodesOpt)
    require(nNodes > 0, "pageRank: empty graph")
    val r0 = scale / nNodes
    val base = (100L - dampingPct) * r0 / 100L
    GraftSession.withLoopConf(edges.sparkSession, p) {
      powerIterate(
        nodes.select(col("node"), lit(base).as("base"), lit(r0).as("r0")),
        eDeg, iterations, dampingPct, nodes)
    }
  }

  /** Seeded-teleport PageRank — the public TrustRank formulation
    * (Gyöngyi, Garcia-Molina, Pedersen 2004): random-jump mass lands
    * ONLY on a trusted seed set, so rank measures proximity-to-trust
    * instead of raw link popularity — the curation prior that gates
    * spam-adjacent domains a plain PageRank still rewards. Nodes
    * unreachable from every seed hold exactly ZERO mass (integer
    * arithmetic, nothing to round). Same fixed-point contract,
    * per-iteration shape, and rotating-checkpoint storage bound as
    * [[pageRank]]; the seed set joins in once, broadcast-sized.
    *
    * @param seeds one-column frame of trusted node ids (deduplicated
    *              here; ids outside the node universe are ignored —
    *              their mass share would teleport to nowhere) */
  def trustRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iterations: Int = 8, dampingPct: Int = 85,
      scale: Long = 1000000L, nodesOpt: Option[DataFrame] = None)
      : DataFrame = {
    val (nodes, eDeg, p, _) = prepare(edges, srcCol, dstCol, nodesOpt)
    val s = seeds.toDF("node")
      .select(col("node").cast("long").as("node")).distinct()
      .join(nodes, Seq("node"), "left_semi")
      .withColumn("_seed", lit(true))
    val nSeeds = s.count()
    require(nSeeds > 0, "trustRank: no seed intersects the node universe")
    val r0 = scale / nSeeds
    val base = (100L - dampingPct) * r0 / 100L
    GraftSession.withLoopConf(edges.sparkSession, p) {
      powerIterate(
        nodes.join(broadcast(s), Seq("node"), "left")
          .select(col("node"),
            when(col("_seed"), lit(base)).otherwise(lit(0L)).as("base"),
            when(col("_seed"), lit(r0)).otherwise(lit(0L)).as("r0")),
        eDeg, iterations, dampingPct, nodes)
    }
  }

  /** HITS hubs-and-authorities (Kleinberg 1999, the public mutual-
    * reinforcement formulation): an authority is a node pointed at by
    * good hubs, a hub points at good authorities. PageRank's single
    * score conflates the two — a link directory can be a top hub while
    * carrying zero authority, and curation wants them apart (gate on
    * authority, spend crawl budget by hub).
    *
    * This is the JACOBI (simultaneous-update) variant under the same
    * fixed-point integer contract as [[pageRank]]: both vectors step
    * from the PREVIOUS round's values — aₜ = norm(Lᵀ h₍ₜ₋₁₎),
    * hₜ = norm(L a₍ₜ₋₁₎) — normalized to `scale` total mass by floor
    * division, so every value is a long and the oracle replays all
    * iterations in a recursive CTE (Kleinberg's sequential update
    * needs the freshly-normalized aₜ inside the same step — a nested
    * full-table aggregate no recursive CTE can express; the Jacobi
    * even/odd subsequences converge to the same principal vectors).
    * Normalizers come out of the SAME previous round — the authority
    * total is Σᵤ h₍ₜ₋₁₎(u)·outdeg(u), the hub total Σᵥ a₍ₜ₋₁₎(v)·indeg(v)
    * — so one (node, h, a) state frame per round suffices.
    *
    * Scale shape per iteration: two equi-shuffle joins of the edge
    * list with the |V|-sized state (on src for the authority step, on
    * dst for the hub step), two partial-agg'd groupBys, two 1-row
    * normalizer broadcasts, one outer join back to the universe —
    * linear in |E| + |V|, rotating-checkpointed like [[pageRank]] (two
    * |V|-sized copies resident, O(1)-deep plan). Overflow bound:
    * raw·scale ≤ scale² and the normalizers ≤ scale·maxdeg must fit a
    * long — the default 10⁶ leaves 9 orders of headroom.
    *
    * @return (node, hub, auth) in integer mass units; nodes with no
    *         out-edges hold hub = 0, nodes with no in-edges auth = 0. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8, scale: Long = 1000000L,
      nodesOpt: Option[DataFrame] = None,
      nNodesOpt: Option[Long] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint()
    require(!e.isEmpty, "hits: empty edge list")
    // the node universe stays checkpointed for the whole loop (every
    // round's outer join reads it); the (h, a) state frame rotates
    val nodes = nodesOpt
      .map(_.toDF("node").select(col("node").cast("long").as("node")))
      .getOrElse(e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
      .localCheckpoint()
    val nNodes = nNodesOpt.filter(_ => nodesOpt.isDefined)
      .getOrElse(nodes.count())
    val p = loopPartitions(math.max(e.count(), nNodes))
    val r0 = scale / nNodes
    require(r0 > 0, s"hits: scale $scale must be >= node count $nNodes")
    val rotate = new Checkpoints.Rotating
    var st = nodes.select(col("node"), lit(r0).as("h"), lit(r0).as("a"))
    GraftSession.withLoopConf(edges.sparkSession, p) {
    for (_ <- 1 to iterations) {
      val hv = st.select(col("node").as("_sn"), col("h"))
      val av = st.select(col("node").as("_dn"), col("a"))
      // raw mutual-reinforcement sums off the previous round
      val araw = e.join(hv, e("src") === hv("_sn"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("araw"))
      val hraw = e.join(av, e("dst") === av("_dn"))
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("hraw"))
      // normalizers are |V|-row re-sums of the raw frames (identical
      // to the degree-weighted previous-round totals, fewer joins)
      val aTot = araw.agg(sum(col("araw")).as("_ta"))
      val hTot = hraw.agg(sum(col("hraw")).as("_th"))
      st = rotate(nodes
        .join(araw, Seq("node"), "left").join(hraw, Seq("node"), "left")
        .crossJoin(broadcast(aTot)).crossJoin(broadcast(hTot))
        .select(col("node"),
          expr("coalesce(hraw, 0L) * " + scale + "L div _th").as("h"),
          expr("coalesce(araw, 0L) * " + scale + "L div _ta").as("a")))
    }
    } // withLoopConf
    Checkpoints.release(nodes)
    Checkpoints.release(e)
    st
  }

  /** Per-node triangle participation over an UNDIRECTED reading of the
    * edge list — the local clustering signal (spam farms and mirror
    * rings are triangle-dense; organic link neighborhoods are sparse),
    * the third member of the centrality family next to [[pageRank]]
    * and [[hits]].
    *
    * Algorithm: degree-ordered wedge closing (the public node-iterator
    * bound, Schank & Wagner 2005). Edges are canonicalized (self-loops
    * dropped, duplicates and reversals merged), then oriented from
    * lower to higher (degree, id) rank; each triangle is found exactly
    * once, as the wedge at its LOWEST-rank corner closed by an
    * oriented edge between the two higher corners. The join plan is
    * engine-exact — set operations only, no floats.
    *
    * Scale shape: the wedge self-join is keyed on the low corner, and
    * degree orientation caps every out-degree at O(√m) (a node of
    * degree d > √(2m) has < √(2m) higher-degree neighbors), so wedge
    * volume — the only super-linear intermediate — is bounded by
    * O(m^{3/2}) TOTAL and per-key by O(m), the classic bound that
    * makes the hub-skew of power-law graphs survivable: the raw
    * (un-oriented) wedge count at a degree-10⁶ hub is 10¹² pairs, the
    * oriented one at most 2m. The closing probe is an equi-join of
    * wedges against the oriented edge list on the (v, w) pair key.
    *
    * @return (node, triangles) — nodes in no triangle are absent. The
    *         returned frame is a local checkpoint (the corpus-sized
    *         intermediates are released before return). */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b")) // also drops null endpoints
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint() // consumed by deg + orientation
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("t"), col("db").as("dt")))
        .otherwise(
          struct(col("b").as("s"), col("a").as("t"), col("da").as("dt")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .localCheckpoint() // consumed by both wedge legs + the probe
    val wedges = oriented
      .select(col("s"), col("t").as("v"), col("dt").as("dv"))
      .join(oriented.select(col("s"), col("t").as("w"), col("dt").as("dw")),
        Seq("s"))
      // order the two high corners by the same rank, so each unordered
      // wedge appears once and matches the probe edge's orientation
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val out = wedges
      .join(oriented.select(col("s").as("v"), col("t").as("w")),
        Seq("v", "w"))
      .select(explode(array(col("s"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
      .localCheckpoint()
    Checkpoints.release(und)
    Checkpoints.release(oriented)
    out
  }

  /** k-core of the UNDIRECTED graph: the maximal subgraph in which
    * every node keeps degree ≥ k — the classic dense-cluster extractor
    * (Seidman 1983; link-farm cores survive where organic periphery
    * peels away), completing the centrality family ([[pageRank]],
    * [[hits]], [[triangleCounts]]).
    *
    * Algorithm: iterative peeling to the TRUE fixpoint — each round
    * drops every node whose degree among the survivors is < k; peeling
    * is confluent, so the result is unique and engine-exact (set
    * operations only). The oracle replays it as a recursive CTE that
    * emits a round only while the alive set strictly shrinks, with the
    * empty-core case resolved by a final stability check.
    *
    * Scale shape per round: one semi-join of the edge list against the
    * alive set on EACH endpoint (both equi-joins on the node key) and
    * a partial-agg'd degree count — linear in |E|; the alive frame
    * rotates through local checkpoints (two |V|-sized copies
    * resident). Round count is the peeling depth: O(log n)-ish on
    * real clustered graphs, O(n) only on adversarial paths — the
    * per-round driver action is the termination test itself (one
    * count), the same inherent cost every fixpoint loop carries.
    *
    * @return (node, core_degree) — the members of the k-core with
    *         their within-core degree; empty when no k-core exists. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1: $k")
    val und = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint() // consumed every peeling round
    val p = loopPartitions(und.count())
    // broadcast OFF for the peel (r20, measured): the job bill of
    // this loop is the per-round BroadcastExchange BUILD jobs of the
    // two alive-side semi-joins (BenchDiag: 158 jobs ≈ 4/round, task
    // time 1.6 s — the builds are jobs the round fusion below cannot
    // remove; fusing under broadcast ON read 162 jobs / 2.2× task
    // time). Under shuffle joins a whole fused round is ONE job (+ a
    // count), and at corpus scale the alive frame is |V|-sized —
    // never broadcastable — so the shuffle plan is also the one that
    // survives 100×; the p-sized exchanges are peel-state-sized.
    GraftSession.withLoopConf(edges.sparkSession, p,
      allowBroadcast = false) {
    val rotate = new Checkpoints.Rotating
    def degrees(aliveNodes: DataFrame): DataFrame = und
      .join(aliveNodes.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(aliveNodes.select(col("node").as("b")), Seq("b"), "left_semi")
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
    var alive = rotate(und.select(col("a").as("node"))
      .union(und.select(col("b").as("node"))).distinct()
      .select(col("node"), lit(0L).as("core_degree")))
    var n = alive.count()
    var stable = n == 0
    while (!stable) {
      // TWO peel rounds per materialized frame (r20, the trustrank
      // round-fusion discipline): the peel is monotone (rounds only
      // remove nodes) and its fixed point is cadence-invariant, so
      // count-unchanged across a fused step still reads "stable"
      // exactly — peel(peel(A)) has A's count iff neither sub-round
      // removed anything. Halves the job+checkpoint floor the peel
      // pays per logical round (q_kcore read 158 jobs ≈ its wall at
      // the serial floor); the inner frame is recomputed once inside
      // the fused plan (degrees references it twice — ~1.5× the task
      // work of two materialized rounds), the measured cheaper side
      // while task time is floor-sized. Cadence stops at 2: each
      // deeper level doubles the un-checkpointed recomputation
      // (the BPE 2^cadence lesson).
      val next = rotate(degrees(degrees(alive)
          .filter(col("core_degree") >= k))
        .filter(col("core_degree") >= k))
      val m = next.count()
      stable = m == n || m == 0
      if (m == 0) {
        // peel hit bottom: the k-core is empty (confluence). A fresh
        // empty frame — the released checkpoints must not be re-read.
        rotate.releaseLast()
        alive = und.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          next.schema)
      } else alive = next
      n = m
    }
    Checkpoints.release(und)
    alive
    } // withLoopConf
  }

  /** Shared setup: normalized edge list with out-degree folded on
    * (loop-invariant, checkpointed once) + the node universe. */
  /** Loop-sized shuffle partition count — the canonical spelling is
    * [[GraftSession.loopPartitionsOf]]. */
  private[ops] def loopPartitions(maxRows: Long): Int =
    GraftSession.loopPartitionsOf(maxRows)

  /** Shared setup: normalized edge list with out-degree folded on +
    * the node universe, both checkpointed ONCE (the one-shot
    * unknown-cardinality joins run under the ambient AQE session —
    * sizing those is what AQE is for), plus the loop-sized partition
    * count p off the materialized invariants' counts. The loop itself
    * runs under [[GraftSession.withLoopConf]](p): every per-round
    * exchange is p-partitioned and the rounds between checkpoints run
    * as one job. (Local checkpoints do NOT preserve physical
    * partitioning in Spark 4.1 — a `Scan ExistingRDD` plans with
    * UnknownPartitioning, verified against the executed plan — so
    * there is deliberately no repartition-before-checkpoint here: it
    * would buy nothing and cost an |E| exchange.)
    * @return (nodes, eDeg, p, nNodes) */
  private def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      nodesOpt: Option[DataFrame], nNodesOpt: Option[Long] = None)
      : (DataFrame, DataFrame, Int, Long) = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes0 = nodesOpt
      .map(_.toDF("node").select(col("node").cast("long").as("node")))
      .getOrElse(e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val eDeg0 = e.join(deg, "src").localCheckpoint()
    // a caller-supplied count only applies to a caller-supplied
    // universe (the derived src∪dst universe has no caller count)
    val nNodes = nNodesOpt.filter(_ => nodesOpt.isDefined)
      .getOrElse(nodes0.count())
    val p = loopPartitions(math.max(eDeg0.count(), nNodes))
    (nodes0, eDeg0, p, nNodes)
  }

  /** The fixed-point power loop over a per-node (base, r0) seeding —
    * constant for PageRank, seed-gated for TrustRank. `prepNodes` is
    * [[prepare]]'s universe checkpoint, released as soon as the seeded
    * frame (which subsumes it) is materialized. */
  private def powerIterate(seeded: DataFrame, eDeg: DataFrame,
      iterations: Int, dampingPct: Int, prepNodes: DataFrame)
      : DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100]: $dampingPct")
    val nodes = seeded.localCheckpoint()
    Checkpoints.release(prepNodes)
    val rotate = new Checkpoints.Rotating
    var ranks = nodes.select(col("node"), col("r0").as("rank"))
    for (i <- 1 to iterations) {
      // ONE exchange + ONE broadcast per round (r20): the damped
      // share aggregation and the teleport base fold in a single
      // UNION-fed hash aggregate — (node, share, 0) contribution rows
      // union (node, 0, base) seed rows, grouped once. The previous
      // spelling closed the round with `nodes LEFT JOIN contrib`,
      // whose per-round BroadcastExchange BUILD is a driver job; the
      // broadcast cannot be reused across rounds (contrib changes)
      // and nodes cannot be the build side (its unmatched rows — the
      // dangling/unreferenced nodes — must be emitted). Folding the
      // join into the aggregate drops 8 broadcast-build jobs from an
      // 8-iteration walk (trustrank 35 → 27 measured) with identical
      // integer arithmetic: base + (d × Σshare) div 100, Σ over the
      // same share set, max(base) over exactly one non-zero row.
      val next = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("rank div deg").as("share"), // true integer floor div
          lit(0L).as("base"))
        .unionAll(nodes.select(col("node"), lit(0L).as("share"),
          col("base")))
        .groupBy("node")
        .agg((max(col("base")) +
          expr(s"($dampingPct * sum(share)) div 100")).as("rank"))
      // checkpoint every SECOND round: two co-partitioned rounds
      // pipeline inside one materialization job (per-round driver
      // floor halves), while plan depth stays bounded at 2 rounds —
      // the static eDeg join never self-nests, so no analyzer blowup.
      // DEEPER fusion measured and refuted (r20 A/B at sf0.1): at
      // cadence 4 the un-checkpointed rank chain re-executes inside
      // each following round's broadcast BUILD — q_trustrank jobs
      // 32 → 29 but summed task time 0.5 → 1.0 s and wall
      // 1.8 → 2.5 s; cadence 2 pays that re-execution exactly once.
      ranks = if (i % 2 == 0 || i == iterations) rotate(next) else next
    }
    // the final checkpoint IS the result; the loop-invariant inputs
    // are not referenced by it (checkpoints truncate lineage)
    Checkpoints.release(nodes)
    Checkpoints.release(eDeg)
    ranks
  }
}
