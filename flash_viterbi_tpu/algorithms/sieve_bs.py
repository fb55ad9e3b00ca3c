"""SIEVE-BS (dynamic median), TPU-native: the last reference algorithm.

The reference (``Base_line/C implementations/SIEVE-BS.c:360-549`` /
``sieve_beam_search.py:65-261``) recurses over a *data-dependent* split
point: during each beam-pruned forward pass it tracks, per end state, the
transition minimizing ``max(#b-hop-ancestors(x_a), #b-hop-descendants(x_b))``
with a ``|j - T/2|`` closeness tie-break, then splits the segment there.

TPU redesign: the split sizes are runtime data, so — unlike ``sieve_mp``'s
static tree — the recursion cannot be a fixed level-batched program.  The
decomposition here:

* **All trellis math runs on device.**  Each recursion node's forward pass
  is one jitted function (auto-memoized per segment length): a dense
  masked beam step with the dynamic-median carry vectorized over all K
  destinations, and the *sequential candidate semantics* of the reference
  (beam-ordered source iteration with strictly-greater improvement, the
  stale-median no-write quirk, median inheritance from the source's path)
  reproduced exactly by a ``lax.scan`` over the B beam slots.
* **b-hop neighborhood counts** (the preprocessing of ``calc`` :656-672)
  are K simultaneous BFS frontier advances as dense matmuls on device.
* **The host drives only the recursion** — it reads back the split point
  (x_a, x_b, N_left) per node, prunes the state set with a vectorized
  numpy BFS (``_reach``, sieve_beam_search.py:504-546), and recurses —
  mirroring the reference's own inherently sequential control flow.
* Per-dest *active token sets* (the beam snapshot attached to a median,
  :465-484) collapse to one invariant: the set attached to state h is
  always the beam recorded after step ``med_n[h]`` — so a (T, K) beam
  log replaces the reference's per-state set copies.

Documented deltas (identical off exact fp ties, same policy as
``sieve_bs_mp``): score ties resolve by lowest state index (the reference
resolves by dict-insertion order); scores are fp32 (reference float64).

Prior semantics — the two reference implementations differ off their own
fixtures: the C binary re-inits every recursion node from the **model Pi**
(``SIEVE-BS.c:367``: ``log(vit->Pi[i]) + log B``), while the Python chain
threads the root-call Pi, which ``Baseline.py:160`` always passes as
uniform ``log(1/K)``.  They coincide on every reference fixture (the
generator's Pi *is* uniform).  This decoder follows the **C binary**
(model Pi at every node) — the artifact the repo verifies bit-exact —
pinned by a non-uniform-Pi C-parity test; ``oracle.sieve_bs`` keeps the
Baseline.py convention and is therefore a valid yardstick only for
uniform model Pi.

Reference quirks kept: emission misses contribute 0 (dict fallthrough
:119-123); left children force ``last=x_a`` while right children inherit
the parent's resolved ``last`` (:207/:259); left recursions thread the
parent's token set, right recursions get the median-step beam (:218-219).

Totality extension: when beam pruning eliminates every median candidate
of a subproblem the reference *crashes* (KeyError at
``sieve_beam_search.py:88`` — the -1 sentinel enters the child's index
set; ``oracle.sieve_bs`` raises ``ReferenceUndefined`` there).  This
decoder instead emits the SIEVE-Mp-style ``(-1, -1)`` sentinel pair for
that node, skips the impossible recursion, and decodes the rest — the
only defined-everywhere behavior consistent with the family's sentinel
convention (``SIEVE-Mp.c:412-420``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .base import Decoder, register
from .sieve import NEG, _bfs_masks

_SENT_TOUCHED = np.float32(-2.0e38)   # touched but still -inf (dict key present)
_SENT_UNTOUCHED = np.float32(-3.0e38)


def _beam_vals(T1, touched):
    """Order states as heapq.nlargest over the touched dict: finite scores
    first, then touched -inf entries, then absent states."""
    return jnp.where(touched, jnp.where(jnp.isneginf(T1), _SENT_TOUCHED, T1),
                     _SENT_UNTOUCHED)


@partial(jax.jit, static_argnames=("hops",))
def _bhop_counts(A_posF, hops: int):
    """(#<=hops-edge ancestors, #descendants) per state — the reference's
    per-state BFS preprocessing (SIEVE-BS.c:656-672) as K simultaneous
    frontier advances; source excluded unless re-reached (cycle)."""
    K = A_posF.shape[0]
    eye = jnp.eye(K, dtype=jnp.float32)
    ones = jnp.ones((K, K), jnp.float32)
    desc = _bfs_masks(A_posF, eye, ones, hops).sum(axis=1)
    anc = _bfs_masks(jnp.transpose(A_posF), eye, ones, hops).sum(axis=1)
    return anc.astype(jnp.float32), desc.astype(jnp.float32)


def _node_forward_impl(logA, emitQ, A_posF, anc_cnt, desc_cnt, logPi,
                       y_seg, n_valid, mask, tokens0, last_forced, B: int):
    """One recursion node's beam forward pass with dynamic-median tracking.

    ``y_seg`` may be padded past the true segment length ``n_valid`` (the
    host buckets lengths to powers of two so the recursion compiles
    O(log T) programs, not one per distinct length); padded steps pass the
    carry through unchanged.

    Returns (x_a, x_b, n_left, tokens_right (K,) f32, last) — the split
    decision of ``viterbi_space_efficient``'s main loop (:151-219).
    """
    L = y_seg.shape[0]
    K = logA.shape[0]
    Thalf = n_valid.astype(jnp.float32) / 2.0
    iota = jnp.arange(K, dtype=jnp.int32)

    emit0 = emitQ[:, y_seg[0]]
    # model Pi at every node (SIEVE-BS.c:367), not Baseline.py's uniform
    T1_0 = jnp.where(mask > 0, logPi + emit0, NEG)

    # --- step j=1: every winning candidate writes its median (prev_val is
    # +inf), so the dense argmax is the exact sequential result ----------
    emit1 = emitQ[:, y_seg[1]]
    src = jnp.where(tokens0 > 0, T1_0, NEG)
    cand = jnp.where(A_posF > 0, src[:, None] + logA, NEG) + emit1[None, :]
    cand = jnp.where(mask[None, :] > 0, cand, NEG)
    t1 = jnp.max(cand, axis=0)
    winner = jnp.argmax(cand, axis=0).astype(jnp.int32)
    touched = jnp.logical_and((tokens0 @ A_posF) > 0, mask > 0)
    won = jnp.logical_and(touched, t1 > NEG)
    pair1 = jnp.maximum(anc_cnt[winner], desc_cnt)
    mx = jnp.where(won, winner, -1)
    my = jnp.where(won, iota, -1)
    mn = jnp.where(won, 1, 0).astype(jnp.int32)
    mval = jnp.where(won, pair1, jnp.inf)
    T1 = jnp.where(touched, t1, NEG)

    bvals = _beam_vals(T1, touched)
    _, bidx = jax.lax.top_k(bvals, B)
    eff = jnp.minimum(B, jnp.sum(touched))
    slot_ok = jnp.arange(B) < eff
    tokm = jnp.zeros((K,), jnp.float32).at[bidx].max(slot_ok.astype(jnp.float32))
    beams = jnp.zeros((L, K), jnp.float32).at[1].set(tokm)

    # --- steps j=2..L-1: lax.scan over beam slots reproduces the
    # reference's sequential candidate processing exactly ----------------
    def outer(carry, x):
        T1, mx, my, mn, mval, bidx, eff, touched, beams = carry
        j, emit_row = x

        def slot(c_carry, c):
            nT1, nmx, nmy, nmn, nmval = c_carry
            node = bidx[c]
            validc = c < eff
            cand = T1[node] + logA[node] + emit_row  # (K,)
            edge = (A_posF[node] > 0) & (mask > 0) & validc
            win = edge & (cand > nT1)
            pair = jnp.maximum(anc_cnt[node], desc_cnt)
            pv = mval[node]
            closer = (jnp.abs(j.astype(jnp.float32) - Thalf)
                      < jnp.abs(mn[node].astype(jnp.float32) - Thalf))
            take_new = (pair < pv) | ((pair == pv) & closer)
            take_inh = (~take_new) & (mx[node] != -1)
            wn = win & take_new
            wi = win & take_inh
            nmx = jnp.where(wn, node, jnp.where(wi, mx[node], nmx))
            nmy = jnp.where(wn, iota, jnp.where(wi, my[node], nmy))
            nmn = jnp.where(wn, j, jnp.where(wi, mn[node], nmn)).astype(jnp.int32)
            nmval = jnp.where(wn, pair, jnp.where(wi, pv, nmval))
            nT1 = jnp.where(win, cand, nT1)
            return (nT1, nmx, nmy, nmn, nmval), None

        init = (jnp.full((K,), NEG), jnp.full((K,), -1, jnp.int32),
                jnp.full((K,), -1, jnp.int32), jnp.zeros((K,), jnp.int32),
                jnp.full((K,), jnp.inf, jnp.float32))
        (nT1, nmx, nmy, nmn, nmval), _ = jax.lax.scan(
            slot, init, jnp.arange(B))

        ntouched = jnp.logical_and((tokm_of(bidx, eff) @ A_posF) > 0, mask > 0)
        nbvals = _beam_vals(nT1, ntouched)
        _, nbidx = jax.lax.top_k(nbvals, B)
        neff = jnp.minimum(B, jnp.sum(ntouched))
        ntok = tokm_of(nbidx, neff)
        nbeams = beams.at[j].set(ntok)
        nT1 = jnp.where(ntouched, nT1, NEG)
        valid = j < n_valid  # padded step: pass the carry through
        new = (nT1, nmx, nmy, nmn, nmval, nbidx, neff, ntouched, nbeams)
        old = (T1, mx, my, mn, mval, bidx, eff, touched, beams)
        return tuple(jnp.where(valid, n_, o_) for n_, o_ in zip(new, old)), None

    def tokm_of(bidx, eff):
        ok = (jnp.arange(B) < eff).astype(jnp.float32)
        return jnp.zeros((K,), jnp.float32).at[bidx].max(ok)

    if L > 2:
        (T1, mx, my, mn, mval, bidx, eff, touched, beams), _ = jax.lax.scan(
            outer, (T1, mx, my, mn, mval, bidx, eff, touched, beams),
            (jnp.arange(2, L), emitQ[:, y_seg[2:]].T))

    last = jnp.where(last_forced >= 0, last_forced,
                     jnp.argmax(_beam_vals(T1, touched)).astype(jnp.int32))
    x_a = mx[last]
    x_b = my[last]
    n_left = mn[last]
    tokens_right = jnp.where(x_a != -1, beams[n_left], jnp.zeros((K,)))
    return x_a, x_b, n_left, tokens_right, last


_node_forward = partial(jax.jit, static_argnames=("B",))(_node_forward_impl)

# Fixed lane width for level-batched node forwards: all ready nodes of one
# length bucket run as ceil(n/_LANES) vmapped dispatches (padded by
# replaying lane 0) instead of one dispatch per node — through the axon
# tunnel a synced dispatch has a ~25 ms floor, so at T=256 (~hundreds of
# nodes) this is the difference between ~8 s and ~1 s of pure sync
# overhead.  A FIXED width keeps the compile count at one program per
# length bucket (a data-dependent width would recompile per group size —
# remote compiles cost far more than the padded lanes' wasted FLOPs).
_LANES = 8


@partial(jax.jit, static_argnames=("B",))
def _node_forward_batch(logA, emitQ, A_posF, anc_cnt, desc_cnt, logPi,
                        y_segs, n_valids, masks, tokens0s, last_forceds,
                        B: int):
    """vmap of :func:`_node_forward_impl` over a lane of recursion nodes."""
    return jax.vmap(
        lambda ys, nv, mk, tk, lf: _node_forward_impl(
            logA, emitQ, A_posF, anc_cnt, desc_cnt, logPi,
            ys, nv, mk, tk, lf, B=B)
    )(y_segs, n_valids, masks, tokens0s, last_forceds)


def _host_bfs(adj: np.ndarray, src: int, hops: int) -> np.ndarray:
    """Visited-gated level BFS (traversal direction rows -> cols),
    <= ``hops`` edge hops; source excluded unless re-reached.  One
    primitive serves both reach conventions: the reference's ``_reach``
    (sieve_beam_search.py:504-546, b-1 edges via :func:`_host_reach`)
    and the dynamic-median oracles' global-index BFS
    (``algorithms.sieve_dyn``, plain hop count)."""
    K = adj.shape[0]
    visited = np.zeros(K, bool)
    frontier = np.zeros(K, bool)
    frontier[src] = True
    for _ in range(max(hops, 0)):
        nxt = adj[frontier].any(axis=0) & ~visited
        if not nxt.any():
            break
        visited |= nxt
        frontier = nxt
    return visited


def _host_reach(A_pos: np.ndarray, src: int, b: int, out: bool) -> np.ndarray:
    """<= b-1 edge hops along out- (in-) edges, the reference's
    depth-from-1 counting."""
    return _host_bfs(A_pos if out else A_pos.T, src, b - 1)


def sieve_bs_decode(logA, logB_raw, logPi, y, beam_width: int,
                    b_hops: int | None = None) -> list[tuple[int, int]]:
    """Full SIEVE-BS decode; returns the in-order median-pair list
    (bit-compatible with ``oracle.sieve_bs.sieve_bs`` off exact fp ties).

    Host-driven recursion (split sizes are runtime data — the reference's
    control flow is inherently sequential here); every forward pass and the
    BFS-count preprocessing run on device.
    """
    return sieve_bs_decode_many(logA, logB_raw, logPi,
                                np.asarray(y)[None], beam_width,
                                b_hops=b_hops)[0]


def sieve_bs_decode_many(logA, logB_raw, logPi, ys, beam_width: int,
                         b_hops: int | None = None
                         ) -> list[list[tuple[int, int]]]:
    """SIEVE-BS over a batch of sequences with ONE shared lane scheduler.

    Every sequence's recursion tree feeds the same level queue, so the
    8-lane batched forwards fill with nodes from across the batch — a
    batch of S sequences keeps the lanes ~S/(S+lanes) full even when each
    individual tree is a serial chain.  Per-node math and per-sequence
    results are identical to sequence-at-a-time decoding.
    """
    ys_np = np.asarray(ys)
    S, T = ys_np.shape
    K = int(logA.shape[0])
    B = min(int(beam_width), K)

    A_posF = (logA > NEG).astype(jnp.float32)
    A_pos_np = np.asarray(A_posF) > 0
    emitQ = jnp.where(logB_raw > NEG, logB_raw, 0.0)
    # logical (non-padding) states: padded states are all -inf everywhere
    # (same liveness rule as sieve_dyn); the model-Pi prior is already
    # -inf there, so padding cannot flip fp-tie outcomes
    real = (np.isfinite(np.asarray(logA)).any(axis=1)
            | np.isfinite(np.asarray(logB_raw)).any(axis=1)
            | np.isfinite(np.asarray(logPi)))
    b = T if b_hops is None else int(b_hops)
    # visited-gated BFS saturates after at most K productive hops (every
    # state, incl. a cycle-re-reached source, enters `visited` once), so
    # capping at K is bit-identical and avoids a T-long matmul scan at
    # long-sequence configs
    anc_cnt, desc_cnt = _bhop_counts(A_posF, hops=min(max(b - 1, 0), K))

    # Level-batched host recursion: the reference's control flow is
    # inherently sequential down a root-to-leaf chain, but SIBLING
    # subtrees are independent once their parent's split is known.  The
    # scheduler therefore runs breadth-first: all ready nodes of a level,
    # grouped by power-of-two length bucket, forward together in lanes of
    # ``_LANES`` — identical per-node math (the same _node_forward_impl
    # under vmap), only the dispatch schedule changes.  The in-order pair
    # list (the reference's self.path append order) is reconstructed from
    # the recursion tree afterwards.
    nodes: list[dict] = []

    def new_node(mask_np, y_seg, last, tokens_np):
        nodes.append({"mask": mask_np, "y": y_seg, "last": last,
                      "tokens": tokens_np, "kind": None, "pair": None,
                      "left": None, "right": None})
        return len(nodes) - 1

    roots = [new_node(np.asarray(real, bool), ys_np[s], None, None)
             for s in range(S)]
    level = list(roots)
    while level:
        ready = []
        for nid in level:
            nd = nodes[nid]
            L = len(nd["y"])
            if nd["mask"].sum() <= 1:
                nd["kind"] = "skip"
            elif L == 1:
                # single-frame node: the oracle's forward loop never runs,
                # no median is recorded — sentinel pair, no recursion
                nd["kind"] = "sentinel"
            else:
                nd["kind"] = "forward"
                ready.append(nid)

        # group by compiled length bucket (next power of two: O(log T)
        # distinct programs, not one per data-dependent split length)
        buckets: dict[int, list[int]] = {}
        for nid in ready:
            L = len(nodes[nid]["y"])
            Lp = 1 << max(1, (L - 1)).bit_length() if L > 2 else L
            buckets.setdefault(Lp, []).append(nid)

        nxt: list[int] = []
        # issue every lane-chunk of the level WITHOUT syncing (through the
        # axon tunnel a synced dispatch has a ~25 ms floor; one readback
        # per LEVEL instead of per chunk cut the K=3965 headline ~3x)
        pending = []
        for Lp, grp in sorted(buckets.items()):
            for g0 in range(0, len(grp), _LANES):
                chunk = grp[g0:g0 + _LANES]
                n = len(chunk)
                ys = np.zeros((_LANES, Lp), np.int32)
                ns = np.zeros((_LANES,), np.int32)
                ms = np.zeros((_LANES, K), np.float32)
                tk = np.zeros((_LANES, K), np.float32)
                lf = np.full((_LANES,), -1, np.int32)
                for i, nid in enumerate(chunk):
                    nd = nodes[nid]
                    L = len(nd["y"])
                    ys[i, :L] = nd["y"]
                    ns[i] = L
                    ms[i] = nd["mask"]
                    tk[i] = nd["mask"] if nd["tokens"] is None else nd["tokens"]
                    lf[i] = -1 if nd["last"] is None else nd["last"]
                for i in range(n, _LANES):  # pad: replay lane 0 (discarded)
                    ys[i], ns[i], ms[i], tk[i], lf[i] = (ys[0], ns[0], ms[0],
                                                         tk[0], lf[0])
                out = _node_forward_batch(
                    logA, emitQ, A_posF, anc_cnt, desc_cnt, logPi,
                    jnp.asarray(ys), jnp.asarray(ns), jnp.asarray(ms),
                    jnp.asarray(tk), jnp.asarray(lf), B=B)
                pending.append((chunk, out))
        for chunk, (xa, xb, nl, tr, lr) in pending:
                xa = np.asarray(xa); xb = np.asarray(xb)
                nl = np.asarray(nl); lr = np.asarray(lr)
                tr = np.asarray(tr) > 0
                for i, nid in enumerate(chunk):
                    nd = nodes[nid]
                    L = len(nd["y"])
                    x_a, x_b = int(xa[i]), int(xb[i])
                    n_left, last_r = int(nl[i]), int(lr[i])
                    nd["pair"] = (x_a, x_b)
                    if n_left > 1 and x_a >= 0:
                        lm = _host_reach(A_pos_np, x_a, n_left, out=False)
                        lm = lm.copy()
                        lm[x_a] = True
                        nd["left"] = new_node(lm, nd["y"][:n_left], x_a,
                                              nd["tokens"])
                        nxt.append(nd["left"])
                    n_right = L - n_left
                    if n_right > 1 and x_b >= 0:
                        rm = _host_reach(A_pos_np, x_b, n_right, out=True)
                        rm = rm.copy()
                        rm[x_b] = True
                        nd["right"] = new_node(rm, nd["y"][-n_right:],
                                               last_r, tr[i])
                        nxt.append(nd["right"])
        level = nxt

    # in-order flatten == the reference's append order (left subtree,
    # own pair, right subtree); iterative to dodge recursion limits
    def flatten(root: int) -> list[tuple[int, int]]:
        path: list[tuple[int, int]] = []
        stack: list[tuple[int, bool]] = [(root, False)]
        while stack:
            nid, emit = stack.pop()
            nd = nodes[nid]
            if nd["kind"] == "skip":
                continue
            if nd["kind"] == "sentinel":
                path.append((-1, -1))
                continue
            if emit:
                path.append(nd["pair"])
                continue
            if nd["right"] is not None:
                stack.append((nd["right"], False))
            stack.append((nid, True))
            if nd["left"] is not None:
                stack.append((nd["left"], False))
        return path

    return [flatten(r) for r in roots]


def _memory(K: int, T: int, beam_width: int = 64, **_) -> int:
    # per node: T1/median carries (5 K-vectors) + the (T, K) beam log +
    # b-hop count vectors; derived from the decoder's actual live buffers
    return 5 * K * 4 + T * K * 4 + 2 * K * 4


@register("sieve_bs")
def _build(beam_width: int = 64, b_hops: int | None = None, **static) -> Decoder:
    from .sieve_dyn import _flatten

    def fn(logA, logB, logPi, y):
        pairs = sieve_bs_decode(logA, logB, logPi, y, beam_width=beam_width,
                                b_hops=b_hops)
        # shared pretty_print_path flattening (all -1 when nothing resolved,
        # the family's unresolved-position convention)
        return jnp.asarray(_flatten(pairs, int(y.shape[0])))

    def batch_fn(logA, logB, logPi, ys):
        T = int(ys.shape[1])
        many = sieve_bs_decode_many(logA, logB, logPi, ys,
                                    beam_width=beam_width, b_hops=b_hops)
        return jnp.stack([jnp.asarray(_flatten(p, T)) for p in many])

    return Decoder("sieve_bs", fn,
                   {"beam_width": beam_width, "b_hops": b_hops, **static},
                   _memory, jittable=False, batch_fn=batch_fn)
