"""Seeded synthetic HMM generators.

Reproduces the reference generators' *exact* sampling semantics so that a
given ``(seed, K, M, T, prob)`` yields bit-identical matrices and observation
sequences to the reference scripts:

* sparse random-graph HMM — ``/root/reference/generate_data/data_script.py``
  (binomial out-degree :14, choice without replacement :18, U(0.01,1) weights
  :21, row-normalize :30-32; B ~ U(0.1,1) row-normalized :38-49; Pi uniform
  :94; observations via ``random.randint`` seeded with ``random.seed`` :86).
* DAG HMM — ``/root/reference/generate_data/data_script_dag.py`` (gnp random
  graph keeping ``u < v`` edges :51-52, ``nan_to_num`` row-normalize :53-55).

Rows with zero sampled edges normalize to 0/0 = NaN in the sparse generator
(the reference keeps them; published configs never hit this).  Pass
``sanitize=True`` to zero such rows instead.
"""

from __future__ import annotations

import random as _pyrandom

import numpy as np

from .hmm import HMM


def sparse_graph_A(K: int, seed: int = 1, prob: float = 0.2) -> np.ndarray:
    """Transition matrix of a random sparse graph (reference data_script.py:5-35)."""
    rng = np.random  # the reference uses the global numpy RNG, seeded here
    rng.seed(seed)
    A = np.zeros((K, K), dtype=float)
    allstates = [x for x in range(K)]
    for state in range(K):
        edges = rng.binomial(K, p=prob, size=None)
        targets = rng.choice(allstates, size=edges, replace=False)
        ps = rng.uniform(0.01, 1, size=edges)
        for i in range(edges):
            A[state][targets[i]] = ps[i]
    for i in range(K):
        A[i,] = A[i,] / np.sum(A[i,])
    return A


def uniform_B(M: int, K: int, seed: int = 1) -> np.ndarray:
    """Emission matrix, U(0.1,1) row-normalized (reference data_script.py:38-49)."""
    np.random.seed(seed)
    B = np.random.uniform(0.1, 1, (K, M))
    return B / B.sum(axis=1)[:, None]


def observations(T: int, M: int, seed: int | None = None) -> np.ndarray:
    """Observation sequence via Python's ``random.randint`` (data_script.py:86).

    The reference script never re-seeds ``random`` for the sparse generator
    (it relies on interpreter start-up state); ``Baseline.py:55`` and the DAG
    script do ``random.seed(sd)`` first.  We always seed for reproducibility.
    """
    if seed is not None:
        _pyrandom.seed(seed)
    return np.array([_pyrandom.randint(0, M - 1) for _ in range(T)], dtype=np.int32)


def make_sparse_hmm(
    K: int, M: int, T: int, prob: float, seed: int = 1, sanitize: bool = False
) -> tuple[HMM, np.ndarray]:
    """Full generated problem: (HMM, observation sequence)."""
    _pyrandom.seed(seed)
    y = np.array([_pyrandom.randint(0, M - 1) for _ in range(T)], dtype=np.int32)
    A = sparse_graph_A(K, seed=seed, prob=prob)
    B = uniform_B(M, K, seed=seed)
    Pi = np.full(K, 1.0 / K)
    if sanitize:
        bad = ~np.isfinite(A).all(axis=1)
        A[bad] = 0.0
    return HMM(A=A, B=B, Pi=Pi), y


def make_dag_hmm(
    K: int, M: int, T: int, seed: int = 1, sanitize: bool = False
) -> tuple[HMM, np.ndarray]:
    """DAG-structured HMM (reference data_script_dag.py:46-61).

    Matches the reference up to networkx's sampling: edges (u,v) with u < v
    kept from a G(n, 0.9) directed graph, weights U(0,1) from Python's
    ``random`` module, rows normalized with NaN->0.
    """
    _pyrandom.seed(seed)
    y = np.array([_pyrandom.randint(0, M - 1) for _ in range(T)], dtype=np.int32)
    try:
        import networkx as nx

        G = nx.gnp_random_graph(K, 0.9, directed=True)
        DAG = nx.DiGraph(
            [(u, v, {"weight": _pyrandom.uniform(0, 1)}) for (u, v) in G.edges() if u < v]
        )
        A = nx.to_numpy_array(DAG)
        if A.shape[0] < K:  # isolated trailing nodes
            Ap = np.zeros((K, K))
            Ap[: A.shape[0], : A.shape[1]] = A
            A = Ap
    except ImportError:
        # networkx not available: equivalent G(n,p) upper-triangular sampling
        A = np.zeros((K, K))
        for u in range(K):
            for v in range(K):
                if u != v and _pyrandom.random() < 0.9 and u < v:
                    A[u, v] = _pyrandom.uniform(0, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        if sanitize:
            A = A / np.where(A.sum(axis=1, keepdims=True) == 0, 1.0, A.sum(axis=1, keepdims=True))
        else:
            # NOTE: the reference divides by ``A.sum(axis=1)`` *without*
            # keepdims (data_script_dag.py:54), which broadcasts over columns
            # and overflows to 1.8e308 via nan_to_num where a column index's
            # row sum is 0 (the sink node).  Reproduced verbatim for fixture
            # compatibility; pass sanitize=True for a usable DAG HMM.
            A = A / A.sum(axis=1)
    A = np.nan_to_num(A)
    B = uniform_B(M, K, seed=seed)
    Pi = np.full(K, 1.0 / K)
    return HMM(A=A, B=B, Pi=Pi), y
