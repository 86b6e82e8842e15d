"""Connected components over near-duplicate candidate pairs
(engine-scope addition): the clustering step of web-scale dedup —
LSH/Jaccard emit PAIRS, but keeping one representative per duplicate
CLASS needs the transitive closure (a~b, b~c ⇒ keep one of {a,b,c}).

Two interchangeable algorithms behind one signature:

- ``label`` — iterative min-label propagation. Every vertex starts
  labelled with its own id; each round every vertex takes the minimum
  label among itself and its neighbours; at fixpoint each component is
  labelled with its smallest member id. Rounds = graph DIAMETER: the
  cheapest per-round plan (one join + one partial-agg min), ideal for
  the tiny-clique/short-chain graphs near-dup candidates actually form,
  but an adversarial n-vertex chain needs n rounds.
- ``star`` — large-star/small-star alternation [Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14]. Large-star
  hangs every neighbour LARGER than u off the minimum of u's
  neighbourhood; small-star re-hangs the smaller neighbours. Each pair
  of steps roughly squares path-shortcutting, so convergence is
  O(log² n) rounds worst-case (log-ish in practice) — a 10k chain
  closes in ~5 alternations where min-label needs 10k rounds (pinned
  in tests/test_operators.py).
- ``auto`` (default) — min-label for ``label_rounds`` rounds (the
  measured fast path); if the graph hasn't converged by then it is NOT
  clique-shaped: collapse it through the partial labels (src/dst →
  current label, self-edges dropped — strictly shrinking) and finish
  with star alternation. Worst case O(log² n) rounds overall, fast
  path identical to ``label``.

Scale notes (both algorithms):
- Per round: shuffles keyed by vertex id with map-side partial mins —
  no broadcast of anything graph-sized, no driver collect.
- ``localCheckpoint(eager=False)`` truncates per-iteration lineage —
  without it the plan doubles every round and analysis cost explodes
  by round ~10; the convergence certificate's agg is the one action
  that materializes each round (ONE Spark job per round).
- Convergence certificates are cheap aggregates: min-label uses the
  monotone sum-of-labels; star uses (edge count, sum u, sum v) over
  the canonicalized edge set, confirmed by an exact except-check
  before declaring the fixpoint (certificate equality is necessary,
  the except makes it sufficient). Id sums are computed as exact
  (high-20-bits, low-20-bits) pairs so billion-row edge sets with
  ~1e12 ids cannot overflow int64 (_sum_pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Every per-round materialization (edge cache, label/edge checkpoints)
# uses serialized MEMORY_AND_DISK: a 100M+-edge graph's working set
# must SPILL when it outgrows the heap, not OOM the executor — found
# by measurement at the sf100 probe (117.9M candidate pairs; the
# deserialized default filled an 8 GiB heap during round 3).
_SPILL = StorageLevel.MEMORY_AND_DISK


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iters: int = 25,
    algorithm: str = "auto",
    label_rounds: int = 8,
    stats: dict | None = None,
    star_edge_threshold: int = 10_000_000,
    small_graph_max_bytes: int = 128 << 20,
) -> DataFrame:
    """Label each vertex with the smallest vertex id reachable from it
    (= its connected component's canonical representative).

    ``vertices`` must carry every id (isolated vertices label
    themselves). Returns (id_col, label). Deterministic.
    ``algorithm``: 'label' (diameter-bounded min propagation), 'star'
    (O(log² n) large/small-star), or 'auto' (label fast path, star
    escalation after ``label_rounds`` — see module docstring).
    'auto' additionally goes star-FIRST when the edge set reaches
    ``star_edge_threshold``: measured on the real 117.9M-edge sf100
    dedup graph (tools/probe_r8.py, identical 2.15M-cluster output),
    star-only converged in 4 rounds / 107.1 s where label-then-star
    took 157.7 s — at that shape the label rounds are wasted work,
    while at bench scale (thousands of edges) label converges in a few
    cheap rounds and star's heavier per-round plan loses. The edge
    count is read off the ALREADY-persisted edge cache, so the probe
    costs one cheap job, not an extra pass over the pair computation.
    ``stats``: pass a dict to receive {'label_rounds', 'star_rounds',
    'converged'} — rounds actually executed (round-complexity pins in
    tests) and whether a fixpoint was REACHED within ``max_iters``.
    ``converged`` False means the budget was exhausted first and the
    returned labels are PARTIAL (over-segmented: some components carry
    more than one label); a warning is emitted in that case so budget
    exhaustion is never silent.

    ``small_graph_max_bytes`` (r16, the pagerank single-job precedent):
    in 'auto' mode, when the DIRECTED edge list measures under this
    many bytes (measured octet sums for string/binary ids + planner
    fixed widths — the same job that materializes the edge cache), the
    whole label propagation collapses into ONE Arrow pass:
    repartition(1) funnel of the bounded edge cache into a vectorized
    min-label/pointer-jumping worker. Bit-identical output (min
    reachable id per component has exactly one answer; pinned
    cross-regime in tests). 0 disables; explicit 'label'/'star' also
    bypass it (callers asking for a specific distributed algorithm get
    it).
    """
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(
            f"algorithm must be 'auto', 'label' or 'star'; got {algorithm!r}"
        )
    # Persist the DIRECTED edge projection and derive the symmetrized
    # view from the cache: persisting the union itself made the cache
    # fill evaluate the upstream pair pipeline TWICE (Spark does not
    # share subplans across union branches — at dedup scale that is two
    # full tokenize->minhash->bucket passes); the union over the cached
    # projection is two in-memory scans instead.
    e0 = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).persist(
        _SPILL
    )
    und = e0.unionByName(e0.select(F.col("d").alias("s"), F.col("s").alias("d")))
    if stats is None:
        stats = {}
    stats["label_rounds"] = 0
    stats["star_rounds"] = 0
    if algorithm == "auto":
        # Materialize the edge cache with the shape/size measurement
        # job (the first label/star round was about to pay this
        # materialization anyway) and pick the regime: single-job under
        # the measured byte gate, else label-first/star-first by edge
        # count (see docstring).
        from pyspark.sql import types as T

        var_cols = [
            f.name
            for f in e0.schema.fields
            if isinstance(f.dataType, (T.StringType, T.BinaryType))
        ]
        measure = [F.count(F.lit(1)).alias("__n")]
        if small_graph_max_bytes > 0:
            measure += [
                F.sum(F.octet_length(F.col(c))).alias(f"__b{i}")
                for i, c in enumerate(var_cols)
            ]
        sized = e0.agg(*measure).collect()[0]
        n_edges = sized["__n"] or 0
        if small_graph_max_bytes > 0:
            from finlogic_spark.operators.bloomjoin import _est_row_bytes

            var_bytes = sum(
                sized[f"__b{i}"] or 0 for i in range(len(var_cols))
            )
            if (
                n_edges * _est_row_bytes(e0.schema) + var_bytes
                <= small_graph_max_bytes
            ):
                stats["auto_choice"] = "single-job"
                stats["converged"] = True
                labels = _cc_single_job(e0)
                isolated = (
                    vertices.select(F.col(id_col).alias("id"))
                    .join(labels.select("id"), "id", "left_anti")
                    .withColumn("label", F.col("id"))
                )
                out = labels.unionByName(isolated)
                e0.unpersist()
                return out
        if n_edges >= star_edge_threshold:
            algorithm = "star"
            stats["auto_choice"] = "star-first"
        else:
            stats["auto_choice"] = "label-first"
    # Only vertices that touch an edge can change label — iterate on
    # that (typically tiny) subgraph and union the untouched majority
    # back at the end. In a dedup corpus most documents are in NO
    # candidate pair; excluding them shrinks every per-round shuffle
    # from |corpus| to |edge endpoints|.
    labels = (
        und.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False, storageLevel=_SPILL)
    )
    # max_iters is a TOTAL round budget across both phases: in 'auto'
    # the label fast path draws from it first and star gets the
    # remainder, so a caller capping shuffle-round count gets at most
    # max_iters full-graph rounds regardless of algorithm choice.
    if algorithm != "star":
        rounds = max_iters if algorithm == "label" else min(
            label_rounds, max_iters
        )
        labels, converged = _min_label_rounds(und, labels, rounds, stats)
    else:
        converged = False
    if not converged and algorithm != "label":
        # Escalate: the graph is not clique-shaped. Collapse every edge
        # through the partial labels (strictly shrinking: any edge
        # inside an already-merged region becomes a dropped self-edge)
        # and run the O(log² n) star alternation on the remainder. The
        # star output labels the COLLAPSED vertices (current labels);
        # composing through `labels` restores per-vertex results.
        collapsed = (
            und.join(labels.withColumnRenamed("id", "s"), "s")
            .select(F.col("label").alias("cs"), "d")
            .join(
                labels.withColumnRenamed("id", "d").withColumnRenamed(
                    "label", "cd"
                ),
                "d",
            )
            .select(F.col("cs").alias("s"), F.col("cd").alias("d"))
            .filter(F.col("s") != F.col("d"))
        )
        star_budget = (
            max_iters if algorithm == "star"
            else max(0, max_iters - stats["label_rounds"])
        )
        roots, converged = _star_labels(collapsed, star_budget, stats)
        labels = (
            labels.withColumnRenamed("label", "mid")
            .join(
                roots.withColumnRenamed("id", "mid"),
                "mid",
                "left",
            )
            .select(
                "id", F.coalesce("label", F.col("mid")).alias("label")
            )
        )
    e0.unpersist()
    stats["converged"] = converged
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: round budget max_iters={max_iters} "
            "exhausted before a fixpoint — returned labels are PARTIAL "
            "(over-segmented). Raise max_iters or check stats['converged'].",
            RuntimeWarning,
            stacklevel=2,
        )
    isolated = (
        vertices.select(F.col(id_col).alias("id"))
        .join(labels.select("id"), "id", "left_anti")
        .withColumn("label", F.col("id"))
    )
    return labels.unionByName(isolated)


def _cc_single_job(e0: DataFrame) -> DataFrame:
    """All connected-components rounds in ONE Spark job — the
    small-graph regime behind ``connected_components(
    small_graph_max_bytes=...)``, the exact analogue of
    ``_pagerank_single_job``.

    The distributed label path pays a fixed per-round price (join +
    aggregate + certificate job) that dwarfs the label arithmetic on a
    small graph. When the measured edge bytes fit the caller's gate,
    funnel the cached DIRECTED edge list through ``repartition(1)``
    (the upstream pair pipeline stays parallel; only the bounded edge
    list funnels) into one Arrow worker that runs vectorized
    min-label propagation with pointer jumping:

    - node ids (any orderable type) are dictionary-encoded by Arrow,
      then ranked via ``sort_indices`` so comparing RANKS is comparing
      values (utf8 sort order == Spark's binary string min ordering);
    - each round relaxes labels across edges both ways
      (``np.minimum.at``) and then pointer-jumps
      (``lab = min(lab, lab[node_of_rank(lab)])``) — the hash-to-min
      shape, O(log n) rounds on adversarial chains, one on cliques;
    - labels are monotone non-increasing integer vectors, so the loop
      terminates at the first unchanged round — that IS the fixpoint.

    Output: (id, label) for every edge ENDPOINT, label = min reachable
    id — bit-identical to the distributed rounds (one answer exists;
    pinned cross-regime in tests/test_operators.py)."""
    from pyspark.sql import types as T

    id_type = e0.schema["s"].dataType
    out_schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("label", id_type)]
    )

    def _run(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        tbls = [pa.Table.from_batches([b]) for b in batches]
        if not tbls:
            return
        t = pa.concat_tables(tbls)
        s = t.column("s").combine_chunks()
        d = t.column("d").combine_chunks()
        enc = pa.chunked_array([s, d]).combine_chunks().dictionary_encode()
        nodes = enc.dictionary
        n = len(nodes)
        if n == 0:
            return
        # rank -> node index, and node index -> rank (value order)
        order = pc.sort_indices(nodes).to_numpy().astype(np.int64, copy=False)
        rank_of = np.empty(n, dtype=np.int64)
        rank_of[order] = np.arange(n, dtype=np.int64)
        idx = enc.indices.to_numpy().astype(np.int64, copy=False)
        m = len(s)
        si, di = idx[:m], idx[m:]
        lab = rank_of.copy()
        while True:
            old = lab
            lab = lab.copy()
            np.minimum.at(lab, di, old[si])
            np.minimum.at(lab, si, old[di])
            np.minimum(lab, lab[order[lab]], out=lab)
            if np.array_equal(lab, old):
                break
        yield pa.record_batch(
            [nodes, nodes.take(pa.array(order[lab]))], ["id", "label"]
        )

    # ADVICE r16: a null endpoint would put nulls into enc.indices and
    # to_numpy() (zero-copy) raises, failing the whole query in this
    # regime. A null endpoint cannot join anything in the distributed
    # regime either (join semantics drop it), so filter before the
    # funnel — connectivity among non-null ids is unaffected.
    res = (
        e0.filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .select("s", "d")
        .repartition(1)
        .mapInArrow(_run, out_schema)
    )
    # one eager job end-to-end, after which the caller can release the
    # edge cache (same discipline as _pagerank_single_job)
    return res.localCheckpoint(eager=True, storageLevel=_SPILL)


# Certificates sum vertex ids, which can be arbitrarily large (sf100
# chained keys reach ~9e11; 118M edges × that overflows int64 — found
# by an ANSI overflow error at the sf100 star probe). Summing the high
# and low 20-bit halves separately keeps every partial EXACT and
# overflow-safe to ~1e9 rows of ~1e12 ids: true_sum = 2^20·hi + lo, so
# (count, hi, lo) equality ⟺ exact-sum equality — the monotone
# convergence argument is unchanged.
_CERT_SHIFT = 20
_CERT_MASK = (1 << _CERT_SHIFT) - 1


def _sum_pair(col: str) -> list:
    return [
        F.sum(F.shiftright(F.col(col), _CERT_SHIFT)),
        F.sum(F.col(col).bitwiseAND(F.lit(_CERT_MASK))),
    ]


def _min_label_rounds(
    und: DataFrame, labels: DataFrame, max_iters: int, stats: dict
) -> tuple[DataFrame, bool]:
    """Min-label propagation rounds; returns (labels, converged)."""

    def cert(lab: DataFrame):
        row = lab.agg(*_sum_pair("label")).first()
        return (row[0], row[1])

    prev_sum = cert(labels)
    for _ in range(max_iters):
        stats["label_rounds"] += 1
        prop = (
            und.join(labels, und.s == labels.id)
            .select(F.col("d").alias("id"), "label")
        )
        # Lazy checkpoint + the convergence agg as the materializing
        # action: one job computes the new labels, persists them (so
        # the next round's join reads checkpointed blocks, lineage
        # truncated), and returns the sum certificate.
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False, storageLevel=_SPILL)
        )
        new_sum = cert(labels)
        if new_sum == prev_sum:
            return labels, True
        prev_sum = new_sum
    return labels, False


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u=min, v=max), self-edges
    dropped, distinct."""
    return (
        e.select(
            F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_labels(
    edges_sd: DataFrame, max_iters: int, stats: dict | None = None
) -> tuple[DataFrame, bool]:
    """Large-star/small-star alternation to fixpoint; input (s, d)
    directed-or-not edges, output ((id, label), converged) — every
    NON-ROOT edge endpoint plus (root, root) rows, i.e. every endpoint
    labelled with its component min. ``converged`` False means
    ``max_iters`` ran out before the fixpoint: the edge set is NOT a
    disjoint star union and the derived labels are partial — callers
    must surface that (connected_components records it in
    stats['converged'] and warns).

    Each alternation:
    - large-star: per neighbourhood Γ⁺(u) = Γ(u) ∪ {u} with
      m = min Γ⁺(u), emit (v, m) for every v ∈ Γ(u), v > u. Every edge
      is emitted from its smaller endpoint's group, so connectivity is
      preserved while large vertices re-hang off local minima.
    - small-star: per u over its SMALLER neighbours N = {v ∈ Γ(u):
      v < u}, m = min N, emit (u, m) and (v, m) for v ∈ N — the step
      that collapses chains of minima.
    Both emit only (bigger, smaller) pairs; a disjoint union of
    min-rooted stars is a fixpoint of the pair. Fixpoint detection:
    cheap certificate (count, sum u, sum v) on the canonical edge set,
    confirmed exact with subtract when it stops moving.
    """
    e = _canon(edges_sd).localCheckpoint(eager=False, storageLevel=_SPILL)

    def certificate(cdf: DataFrame):
        row = cdf.agg(
            F.count(F.lit(1)), *_sum_pair("u"), *_sum_pair("v")
        ).first()
        return tuple(row)

    prev = certificate(e)
    # An empty edge set is trivially a fixpoint (covers max_iters=0
    # with no edges). The certificate just computed already carries the
    # edge count — reuse it rather than paying a second eager job
    # (isEmpty) over the uncached canon plan on every call.
    converged = prev[0] == 0
    for _ in range(max_iters):
        nbr = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            e.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        mins = (
            nbr.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least("mb", "a").alias("m"))
        )
        large = (
            nbr.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("s"), F.col("m").alias("d"))
        )
        e_ls = _canon(large).localCheckpoint(eager=False, storageLevel=_SPILL)

        nbr2 = e_ls.select(
            F.col("u").alias("a"), F.col("v").alias("b")
        ).unionByName(e_ls.select(F.col("v").alias("a"), F.col("u").alias("b")))
        small_side = nbr2.filter(F.col("b") < F.col("a"))
        mins2 = small_side.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            small_side.join(mins2, "a")
            .select(F.col("b").alias("s"), F.col("m").alias("d"))
            .unionByName(
                mins2.select(F.col("a").alias("s"), F.col("m").alias("d"))
            )
        )
        new_e = _canon(small).localCheckpoint(eager=False, storageLevel=_SPILL)
        cert = certificate(new_e)
        if cert == prev and new_e.exceptAll(e).isEmpty():
            # this pass changed nothing — it IS the fixpoint check, so
            # it doesn't count toward rounds-to-convergence
            e = new_e
            converged = True
            break
        if stats is not None:
            stats["star_rounds"] += 1
        prev = cert
        e = new_e
    # star fixpoint: every edge is (root=u, leaf=v); labels = leaves ->
    # root, roots -> themselves
    labels = (
        e.select(F.col("v").alias("id"), F.col("u").alias("label"))
        .unionByName(
            e.select(F.col("u").alias("id"), F.col("u").alias("label"))
        )
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    return labels, converged


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    symmetrize: bool = False,
    round_table_dir: str | None = None,
    resume: bool = False,
    small_graph_max_bytes: int = 128 << 20,
    stats: dict | None = None,
) -> DataFrame:
    """PageRank in exact integer micro-units (engine-scope addition:
    iterative graph analytics beyond connected components — e.g.
    supplier/customer importance on the order graph, or doc centrality
    on a near-dup/link graph).

    All arithmetic is int64: every node starts at ``scale`` micro-units
    and each round receives ``floor(0.15*scale)`` teleport mass plus
    ``(damping_num * r(u)) DIV (damping_den * deg(u))`` from each
    in-neighbour. Integer sums are exact and order-independent, so the
    result is BIT-IDENTICAL across engines, partitionings, and runs —
    a full value-hash oracle (unrolled-CTE SQL), not an error band.
    The DIV flooring loses < 1 micro-unit per edge per round — at
    scale=1e6 that is < 1e-4 relative, far below anything a float
    implementation can promise about cross-engine equality.

    Plan shape per round: one shuffle keyed by src (rank join onto the
    out-edge list, degree pre-joined once) + one partial-agg sum keyed
    by dst, left-joined back onto the full node set so nodes with no
    in-neighbours keep their teleport mass every round (the classic
    formulation) — the minimal PageRank round. Each round's ranks are
    EAGERLY localCheckpointed (same discipline as connected_components:
    lineage truncation + one job per round), which also lets the edge
    cache be released before returning. Dangling nodes (no out-edges)
    still receive mass but emit none — their outflow is dropped, as in
    the classic formulation; symmetrize the edge list for undirected
    graphs.

    ``round_table_dir``: the 100 TB variant the localCheckpoint
    docstring promised — each round's ranks WRITE to
    ``{dir}/round{i}`` parquet and read back, so lineage truncation
    goes through durable storage instead of executor block storage:
    rounds are durably materialized (pass ``resume=True`` to restart a
    killed job from the last COMPLETE round table — completeness is
    the committer's ``_SUCCESS`` marker, checked contiguously from
    round 0 so a gap never silently skips rounds), the rank table
    never pins executor memory/disk blocks, and speculative
    re-execution reads a consistent snapshot.
    Bit-identical to the default variant (integer arithmetic has one
    answer; pinned in tests/test_pagerank_bucketize.py) — the only
    difference is where the round boundary materializes. Measured at
    sf100 (tools/probe_pagerank_sf100.py): the per-round parquet
    round-trip adds seconds per round against executor-local
    checkpoints — the price of restartability, paid per round, not
    per edge. Resume is parameter-checked: round 0 stamps a
    ``{dir}/_params`` sidecar (damping, scale, node/edge counts, an
    order-independent edge fingerprint — NOT ``iterations``, so a
    3-round run can legitimately be extended to 5) and ``resume=True``
    refuses tables written under different parameters or a different
    edge set instead of silently continuing from wrong ranks.

    ``small_graph_max_bytes`` (in-memory variant only): when the
    distinct edge list itself is at most this many estimated bytes —
    i.e. the WHOLE graph is broadcast-sized, not just the rank table —
    all rounds collapse into ONE Spark job (``_pagerank_single_job``:
    repartition(1) + an exact-int64 numpy recurrence in mapInArrow).
    The multi-round plan's fixed price (~2 jobs/round of
    checkpoint+join scheduling) dwarfs the arithmetic at this size:
    the sf0.1 bench graph (~600k edges) spent ~4.5 s running ~11
    materialization jobs whose actual integer math is milliseconds.
    Bit-identical by construction (non-negative floor division ==
    DIV; np.add.at is exact int64) and pinned cross-regime in
    tests/test_pagerank_bucketize.py. Set 0 to force the distributed
    rounds; disabled when broadcasting is off
    (autoBroadcastJoinThreshold <= 0 — that session-level "treat
    everything as big" signal governs this regime too) and on the
    durable-rounds path (single-job has no per-round tables to
    restart from).

    ``symmetrize`` (r17): rank the UNDIRECTED view of the edge list —
    exactly ``pagerank(distinct(e) UNION swap(distinct(e)))`` with
    non-null endpoints, but the symmetrization never materializes on
    the small-graph path: the funnel ships only the DIRECTED distinct
    edges (half the rows of the union) and the Arrow worker relaxes
    each unordered pair in both directions (degree = both-direction
    bincount; a pair present in BOTH input orientations and self-loops
    are collapsed/relaxed exactly once per bi-edge via an unordered
    np.unique, matching the union's distinct). Bit-identical to the
    caller-side union (pinned cross-shape in tests). On the
    distributed regimes the union is built over the persisted directed
    cache, so the upstream edge pipeline still runs once. Callers with
    possibly-null endpoints should filter first (a null never joins in
    the distributed regimes; the Arrow funnel cannot represent it).

    ``stats``: optional dict populated with the chosen ``regime``
    (single_job / broadcast / smj) and the measured counts that drove
    the decision — the same observability pattern as
    connected_components."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # Regime decision: if the rank table (|V| rows) fits under the
    # broadcast threshold, every round's join gets an EXPLICIT
    # F.broadcast hint on the rank side (from round 2 on, ranks come
    # from localCheckpoint, whose LogicalRDD carries no size stats —
    # without the hint the static planner falls to SMJ and the
    # unpartitioned cached edge list re-exchanges every round unless
    # AQE rescues it after the shuffle files are already written; the
    # same explicit-hint rationale as bloomjoin's bypass) and the edge
    # cache is left unpartitioned — pre-partitioning would be pure
    # overhead (measured +2.7 s on the sf0.1 bench graph). If it does
    # NOT fit, the join is SMJ and the edge side MUST be
    # hash-partitioned + sorted by src BEFORE persisting: the cached
    # InMemoryRelation then carries HashPartitioning(src) +
    # per-partition order, so each round exchanges and sorts ONLY the
    # rank table — without this, every round re-exchanged the full
    # cached edge list (measured at sf100: ~50 GB of shuffle per round
    # on a 1.17B-edge graph). Both regime plans are pinned in
    # tests/test_pagerank_bucketize.py.
    #
    # The signal is derived from the already-persisted edge cache, not
    # from a separate pass over the raw input: the distinct edge list
    # is persisted FIRST, the node set and its exact count are then
    # cache scans (the r12/r13 shape recomputed the whole upstream
    # edge pipeline — a join at bench scale — once for the count and
    # once for the cache fill; the r13 A/B priced that decision at
    # ~0.7 s on a sub-3 s query).
    from finlogic_spark.operators.bloomjoin import _est_row_bytes
    from finlogic_spark.sources import parse_size_bytes

    threshold = parse_size_bytes(
        edges.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        ),
        default=10 * 1024 * 1024,
    )
    ed = e.persist(_SPILL)
    if (
        round_table_dir is None
        and 0 < threshold
        and small_graph_max_bytes > 0
    ):
        # Small-graph gate: ONE measurement job over the bare edge
        # cache — this job IS the cache fill the multi-round path pays
        # anyway (previously triggered by nodes.count(), now split: the
        # big path's nodes.count() below reads the already-filled
        # cache). Degrees are NOT joined in for the gate or the
        # single-job path: the worker has the whole edge list and
        # bincounts them in exact int64 — the deg groupBy+join cost
        # ~0.5 s of the 3 s sf0.1 row for a column one numpy call
        # reproduces. ADVICE r15: the gate sizes string/binary node ids
        # by MEASURED octet sums (the bloomjoin pattern), not the flat
        # 20-byte planner default — long ids could otherwise pass the
        # gate on paper and funnel a much larger edge list through the
        # repartition(1) task. The fixed per-type widths stay on top as
        # per-row overhead allowance, same as bloomjoin.
        from pyspark.sql import types as T

        var_cols = [
            f.name
            for f in ed.schema.fields
            if isinstance(f.dataType, (T.StringType, T.BinaryType))
        ]
        sized = ed.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.octet_length(F.col(c))).alias(f"__b{i}")
                for i, c in enumerate(var_cols)
            ],
        ).collect()[0]
        n_edges = sized["__n"] or 0
        var_bytes = sum(
            sized[f"__b{i}"] or 0 for i in range(len(var_cols))
        )
        if (
            n_edges * _est_row_bytes(ed.schema) + var_bytes
            <= small_graph_max_bytes
        ):
            if stats is not None:
                stats["regime"] = "single_job"
                stats["n_edges"] = n_edges
            out = _pagerank_single_job(
                ed, iterations, scale, damping_num, damping_den,
                symmetrize=symmetrize,
            )
            ed.unpersist()
            return out
    ed_dir = None
    if symmetrize:
        # Gate missed (or disabled): the distributed regimes need the
        # materialized bi view after all. Build it OVER the persisted
        # directed cache — both union branches read the same cache, so
        # the upstream edge pipeline still runs once — and hand the
        # regimes the bi edge list exactly as a caller-side union
        # would have. The directed cache is released once the bi cache
        # is filled (nodes.count below).
        ed_dir = ed
        e = ed_dir.union(
            ed_dir.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        ).distinct()
        ed = e.persist(_SPILL)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # node set FROM the cached edge list: the first union branch fills
    # the cache (when the small-graph gate didn't already), the second
    # reads it — the upstream edge pipeline runs ONCE, total.
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
        .persist(_SPILL)
    )
    n_nodes = nodes.count()  # fills ed + nodes caches in one lineage
    if ed_dir is not None:
        ed_dir.unpersist()
    rank_bytes = n_nodes * (_est_row_bytes(nodes.schema) + 8)
    broadcast_ranks = 0 < threshold and rank_bytes <= threshold
    degt = None
    if broadcast_ranks:
        # Broadcast regime keeps the BARE edge list cached (one string
        # pair per row — the r14 shape cached (edge, degree) fused,
        # paying a groupBy+join materialization for a column that is
        # broadcast-sized by this very regime's definition: |deg| <=
        # |V| rows). The degree table is checkpointed ONCE from the
        # cache (tiny job, |V|-bounded rows) and broadcast-joined into
        # every round — stats-less after the checkpoint, so the
        # explicit hint below, same rationale as the rank side.
        degt = deg.localCheckpoint(eager=True, storageLevel=_SPILL)
    else:
        # SMJ regime (big graph): drop the unpartitioned cache FIRST
        # (blocking — the disk budget is the constraint at this size)
        # and rebuild the partitioned (edge, degree) copy from the raw
        # lineage. Repartitioning FROM the cache would hold both
        # copies plus the shuffle files at once (~3x the edge bytes
        # transient — at the sf100 1.17B-edge scale that filled the
        # disk budget); rebuilding costs one upstream recompute,
        # exactly what the r13 shape paid, and only in this regime.
        # The node cache is already materialized, so later rounds
        # never re-derive it.
        ed.unpersist(blocking=True)
        ed = (
            e.join(deg, "src")
            .repartition("src")
            .sortWithinPartitions("src")
            .persist(_SPILL)
        )
    if stats is not None:
        stats["regime"] = "broadcast" if broadcast_ranks else "smj"
        stats["n_nodes"] = n_nodes
    ranks = nodes.withColumn("rank", F.lit(int(scale)).cast("long"))
    teleport = (damping_den - damping_num) * scale // damping_den
    spark = edges.sparkSession
    start = 0
    if round_table_dir is not None:
        start = _durable_round_start(
            spark,
            ed,
            round_table_dir,
            resume,
            iterations,
            damping_num,
            damping_den,
            scale,
            n_nodes,
        )
        if start > 0:
            ranks = spark.read.parquet(
                f"{round_table_dir}/round{start - 1}"
            )
    for i in range(start, iterations):
        rank_side = ranks.withColumnRenamed("node", "src")
        if broadcast_ranks:
            rank_side = F.broadcast(rank_side)
        edge_side = (
            ed.join(F.broadcast(degt), "src") if broadcast_ranks else ed
        )
        contrib = edge_side.join(rank_side, "src").select(
            F.col("dst").alias("node"),
            F.expr(
                f"CAST({damping_num} AS BIGINT) * rank "
                f"DIV (CAST({damping_den} AS BIGINT) * __deg)"
            ).alias("__c"),
        )
        inflow = contrib.groupBy("node").agg(F.sum("__c").alias("__in"))
        inflow_side = F.broadcast(inflow) if broadcast_ranks else inflow
        ranks = nodes.join(inflow_side, "node", "left").select(
            "node",
            (F.lit(teleport) + F.coalesce(F.col("__in"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
        if round_table_dir is None:
            ranks = ranks.localCheckpoint(eager=True, storageLevel=_SPILL)
        else:
            path = f"{round_table_dir}/round{i}"
            ranks.write.mode("overwrite").parquet(path)
            ranks = spark.read.parquet(path)
    ed.unpersist()
    nodes.unpersist()
    return ranks


def _last_complete_round(spark, round_table_dir: str, iterations: int) -> int:
    """Highest round index i < iterations whose ``round{i}`` table is
    COMPLETE (has the committer's ``_SUCCESS`` marker), scanning
    contiguously from 0 — a missing round{j} stops the scan even if
    round{j+1} exists, because round j+1's content would then not be
    derived from a surviving lineage. Storage-agnostic via the Hadoop
    FileSystem API (works for local paths, HDFS, and object stores
    alike)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    base = hpath(round_table_dir)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    last = -1
    for i in range(iterations):
        if fs.exists(hpath(f"{round_table_dir}/round{i}/_SUCCESS")):
            last = i
        else:
            break
    return last


def _durable_round_start(
    spark,
    ed,
    round_table_dir: str,
    resume: bool,
    iterations: int,
    damping_num: int,
    damping_den: int,
    scale: int,
    n_nodes: int,
) -> int:
    """Validate-or-stamp the ``{dir}/_params`` sidecar and return the
    round index to start from (0 = fresh).

    ADVICE r14: resume used to trust any ``round{i}/_SUCCESS`` under
    the directory — a dir left over from a run with different
    damping/scale or a different edge set would silently resume from
    wrong ranks. The sidecar pins (damping, scale, |V|, |E|, an
    order-independent edge fingerprint: sum of per-edge
    ``pmod(xxhash64(src, dst), 1e9+7)`` — commutative int64 partial
    sums, exact under any partitioning, < 2^63 up to ~9e9 edges).
    ``iterations`` is deliberately NOT pinned: round i's content does
    not depend on how many rounds follow, so extending a finished
    3-round run to 5 is a legitimate resume. The fingerprint costs one
    aggregate over the already-cached edge list — the durable path
    only, where a per-round parquet round-trip already dominates.

    Refuses (ValueError) on a parameter/edge mismatch, and on round
    tables with NO sidecar (pre-sidecar or foreign provenance — clear
    the directory to proceed)."""
    fp = ed.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))
        ).alias("__fp"),
    ).collect()[0]
    params = {
        "version": 1,
        "damping_num": int(damping_num),
        "damping_den": int(damping_den),
        "scale": int(scale),
        "n_nodes": int(n_nodes),
        "n_edges": int(fp["__n"] or 0),
        "edge_fp": int(fp["__fp"] or 0),
    }
    pdir = f"{round_table_dir}/_params"
    if resume:
        try:
            row = spark.read.parquet(pdir).collect()[0]
            stored = {k: int(row[k]) for k in params}
        except Exception:
            stored = None
        if stored is not None:
            if stored != params:
                diffs = {
                    k: {"stored": stored[k], "requested": params[k]}
                    for k in params
                    if stored[k] != params[k]
                }
                raise ValueError(
                    "pagerank resume refused: round tables at "
                    f"{round_table_dir} were written under different "
                    f"parameters or a different edge set ({diffs}); "
                    "clear the directory or rerun with the original "
                    "inputs"
                )
            last = _last_complete_round(spark, round_table_dir, iterations)
            return last + 1 if last >= 0 else 0
        if _last_complete_round(spark, round_table_dir, iterations) >= 0:
            raise ValueError(
                f"pagerank resume refused: {round_table_dir} holds round "
                "tables but no _params sidecar, so their provenance "
                "cannot be verified; clear the directory to start fresh"
            )
    # Fresh-stamp path (ADVICE r15): clear any pre-existing round
    # tables BEFORE stamping. A prior run (same params, more rounds)
    # could have left round{k} tables beyond what this run will write;
    # a later longer resume would pass the sidecar check and walk the
    # contiguous _SUCCESS scan into those stale foreign rounds —
    # exactly the silent-wrong-resume the sidecar exists to prevent.
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    base = hpath(round_table_dir)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(base):
        for st in fs.listStatus(base):
            name = st.getPath().getName()
            if name.startswith("round") and name[len("round"):].isdigit():
                fs.delete(st.getPath(), True)
    spark.createDataFrame(
        [tuple(params.values())],
        "version int, damping_num int, damping_den int, scale long, "
        "n_nodes long, n_edges long, edge_fp long",
    ).coalesce(1).write.mode("overwrite").parquet(pdir)
    return 0


def _pagerank_single_job(
    ed: DataFrame,
    iterations: int,
    scale: int,
    damping_num: int,
    damping_den: int,
    symmetrize: bool = False,
) -> DataFrame:
    """All ``iterations`` PageRank rounds in ONE Spark job — the
    small-graph regime behind ``pagerank(small_graph_max_bytes=...)``.

    The multi-round plan pays a fixed per-round price (checkpoint +
    join scheduling, ~2 jobs/round) that dwarfs the arithmetic on a
    small graph: the sf0.1 bench graph (~600k edges) ran ~11
    materialization jobs for ~4.5 s while the integer math itself is
    milliseconds. When the distinct-edge cache is broadcast-sized by
    the caller's explicit gate, the whole power iteration collapses
    into a single Arrow pass: repartition(1) — the upstream pipeline
    stays parallel; only the bounded result funnels — then the EXACT
    int64 recurrence in numpy inside mapInPandas (the justified-Arrow
    class: a bounded working set fenced by a measured regime gate, the
    MMR/k-means precedent).

    Bit-identical to the distributed rounds: floor division on
    non-negative int64 == Spark's DIV, and inflow accumulates via
    ``np.add.at`` in exact int64 (``np.bincount`` would route through
    float64 — the wrong class for a value-hash contract). The worker
    is ``mapInArrow``, not mapInPandas: node ids stay Arrow arrays
    end-to-end and the node-id → dense-index mapping is Arrow's
    C-level ``dictionary_encode`` (hash-based, order-of-appearance) —
    converting the sf0.1 graph's 2.2M string endpoints into pandas
    objects and factorizing cost ~0.4 s, and np.unique's SORT 3.1 s;
    the mapping is internal, never emitted, so its order is free to
    choose. Cross-regime equality is pinned in
    tests/test_pagerank_bucketize.py and by the DuckDB unrolled-CTE
    oracle of ``orders_supplier_pagerank``."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("node", ed.schema["src"].dataType),
            T.StructField("rank", T.LongType()),
        ]
    )
    iters = int(iterations)
    sc = int(scale)
    dn = int(damping_num)
    dd = int(damping_den)
    sym = bool(symmetrize)
    teleport = (dd - dn) * sc // dd

    def _run(batches):
        import numpy as np
        import pyarrow as pa

        tbls = [pa.Table.from_batches([b]) for b in batches]
        if not tbls:
            return
        t = pa.concat_tables(tbls)
        src = t.column("src").combine_chunks()
        dst = t.column("dst").combine_chunks()
        enc = pa.chunked_array([src, dst]).combine_chunks().dictionary_encode()
        nodes = enc.dictionary
        inv = enc.indices.to_numpy().astype(np.int64, copy=False)
        m = len(src)
        si, di = inv[:m], inv[m:]
        nn = len(nodes)
        num = np.int64(dn)
        tele = np.int64(teleport)
        if sym:
            # Undirected view of the DIRECTED distinct input: collapse
            # to unordered unique pairs (so an input carrying BOTH
            # orientations, or a self-loop, relaxes exactly once per
            # bi-edge — matching distinct(e UNION swap(e))), then relax
            # every non-self pair in both directions. Pair packing is
            # safe: nn <= 2*edges and the byte gate bounds edges far
            # below the 3e9 packing limit (nn^2 < 2^63).
            lo = np.minimum(si, di)
            hi = np.maximum(si, di)
            uniq = np.unique(lo * np.int64(nn) + hi)
            lo = uniq // nn
            hi = uniq - lo * nn
            self_m = lo == hi
            plo, phi = lo[~self_m], hi[~self_m]
            sl = lo[self_m]
            counts = (
                np.bincount(plo, minlength=nn)
                + np.bincount(phi, minlength=nn)
                + np.bincount(sl, minlength=nn)
            )
            den_lo = np.int64(dd) * counts[plo]
            den_hi = np.int64(dd) * counts[phi]
            den_sl = np.int64(dd) * counts[sl]
            rank = np.full(nn, sc, dtype=np.int64)
            for _ in range(iters):
                inflow = np.zeros(nn, dtype=np.int64)
                np.add.at(inflow, phi, (num * rank[plo]) // den_lo)
                np.add.at(inflow, plo, (num * rank[phi]) // den_hi)
                if sl.size:
                    np.add.at(inflow, sl, (num * rank[sl]) // den_sl)
                rank = tele + inflow
        else:
            # out-degrees from the (distinct) edge list itself — exact
            # int64 counts; the distributed regimes pay a groupBy+join
            # for this column, here it is one bincount over src codes
            counts = np.bincount(si, minlength=nn)
            denom = np.int64(dd) * counts[si]
            rank = np.full(nn, sc, dtype=np.int64)
            for _ in range(iters):
                contrib = (num * rank[si]) // denom
                inflow = np.zeros(nn, dtype=np.int64)
                np.add.at(inflow, di, contrib)
                rank = tele + inflow
        yield pa.record_batch(
            [nodes, pa.array(rank, type=pa.int64())], ["node", "rank"]
        )

    res = (
        ed.select("src", "dst")
        .repartition(1)
        .mapInArrow(_run, out_schema)
    )
    # one eager job end-to-end (cache scan -> funnel -> recurrence),
    # after which the caller can release the edge cache
    return res.localCheckpoint(eager=True, storageLevel=_SPILL)


def sticky_split_assign(
    pairs: DataFrame,
    ids: DataFrame,
    stored: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "doc_id",
    split_col: str = "split",
    threshold: str = "e6",
) -> DataFrame:
    """Sticky (history-respecting) train/val assignment — the FIX for
    the drift doc_split_drift measures: once a document is trained on,
    its side is frozen, and a NEW document joins the side its near-dup
    component already lives on instead of re-rolling the cluster hash
    (which a component merge can flip).

    Inputs: candidate ``pairs`` over the FULL corpus (old + new),
    ``ids`` (one row per doc, column ``id_col``), and ``stored`` — the
    frozen (id_col, split_col) assignments from previous ingests.
    Output: (id_col, cluster, split) for EVERY id:

    - stored docs keep their stored side VERBATIM (they are in the
      trained model; reassignment is meaningless);
    - a new doc in a component with exactly ONE stored side inherits
      it (the sticky rule — leakage-free by construction even when
      the merge changed the canonical label);
    - a new doc in a component whose stored members span BOTH sides is
      ``quarantine`` (the component already straddles the eval
      boundary — the drift monitor's alert case; adding to either
      side would compound the leak, so the safe call is neither);
    - a new doc in a fully-new component gets the md5 hash of the
      canonical label, exactly doc_cluster_split's rule — stable for
      all future ingests by the same stickiness.

    Plan shape: the graded connected-components plan + one |labels|-
    keyed aggregate (count-distinct of two values — tiny state) + two
    id/label-keyed joins. Nothing new is data-sized beyond CC itself.
    """
    cc = connected_components(pairs, ids, src=src, dst=dst, id_col=id_col)
    st = stored.select(
        F.col(id_col).alias("id"), F.col(split_col).alias("__stored")
    )
    j = cc.join(st, "id", "left")
    per = j.groupBy("label").agg(
        F.count_distinct("__stored").alias("__ns"),
        F.max("__stored").alias("__side"),
    )
    hash_side = (
        F.when(
            F.substring(F.md5(F.col("label").cast("string")), 1, 2)
            < threshold,
            "train",
        ).otherwise("val")
    )
    return j.join(per, "label").select(
        F.col("id").alias(id_col),
        F.col("label").alias("cluster"),
        F.coalesce(
            F.col("__stored"),
            F.when(F.col("__ns") >= 2, F.lit("quarantine"))
            .when(F.col("__ns") == 1, F.col("__side"))
            .otherwise(hash_side),
        ).alias(split_col),
    )
