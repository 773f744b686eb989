"""Learned codec selection — CART classifier over block features (op #37).

Reference: per-block features in ``headers/create_feature.h:9-56``
(log2(range), three normalized quantile positions, average run length);
Gini-CART classifier ``headers/decision_tree.h:13-345`` trained by
``experiments/classifier_CART.cpp``, accuracy eval
``experiments/predict_compress_accuracy.cpp:86-117``.

Ours is a from-scratch numpy CART (no sklearn): deterministic synthetic
training blocks in the reference generators' shapes (``scripts/gen_norm.py``,
``generate_stepwise.py``, ``poisson_randomdie.py``) are labeled by the exact
analytic selector (``select.int_codec_sizes`` — the accuracy ceiling the CART
approximates), then a depth-bounded Gini tree predicts the winner from five
O(n) features. The learned path trades a little compression ratio for
constant-time selection; the engine default stays the exact analytic selector
(cheaper than the reference's exhaustive encoding already), and the encode
job exposes ``selection="learned"`` to switch.
"""

from __future__ import annotations

import numpy as np

_LABELS = ["raw", "for", "delta", "leco", "rle", "dict"]
_LABEL_ID = {n: i for i, n in enumerate(_LABELS)}


def block_features(vals: np.ndarray) -> np.ndarray:
    """Five features per block, mirroring ``create_feature.h:9-56``:
    [log2(range+1), q25, q50, q75 of the normalized values, avg run length
    (log2)]. All O(n) vector ops."""
    n = vals.size
    if n == 0:
        return np.zeros(5)
    v = vals.astype(np.float64)
    lo, hi = float(v.min()), float(v.max())
    rng = hi - lo
    logrange = np.log2(rng + 1.0)
    if rng > 0:
        norm = (v - lo) / rng
        q25, q50, q75 = np.quantile(norm, [0.25, 0.5, 0.75])
    else:
        q25 = q50 = q75 = 0.0
    n_runs = int((vals[1:] != vals[:-1]).sum()) + 1
    avg_run = np.log2(n / n_runs)
    return np.array([logrange, q25, q50, q75, avg_run])


# ---------------------------------------------------------------------------
# Gini CART (arrays-of-nodes representation; no recursion at predict time)
# ---------------------------------------------------------------------------


class CartTree:
    def __init__(self):
        self.feature: list[int] = []
        self.thresh: list[float] = []
        self.left: list[int] = []
        self.right: list[int] = []
        self.label: list[int] = []  # -1 for internal nodes

    def _add(self) -> int:
        for a in (self.feature, self.thresh, self.left, self.right, self.label):
            a.append(-1)
        return len(self.feature) - 1

    def fit(self, X: np.ndarray, y: np.ndarray, max_depth: int = 8, min_leaf: int = 8):
        self._build(X, y, 0, max_depth, min_leaf)
        return self

    def _gini_split(self, col: np.ndarray, y: np.ndarray):
        """Best threshold for one feature by Gini impurity (midpoint grid)."""
        order = np.argsort(col, kind="stable")
        cs, ys = col[order], y[order]
        n = len(ys)
        k = int(y.max()) + 1
        # prefix class counts
        onehot = np.zeros((n, k))
        onehot[np.arange(n), ys] = 1.0
        pref = np.cumsum(onehot, axis=0)
        total = pref[-1]
        cuts = np.flatnonzero(cs[1:] > cs[:-1]) + 1  # split between distinct values
        if cuts.size == 0:
            return None
        nl = cuts.astype(np.float64)
        nr = n - nl
        pl = pref[cuts - 1]
        pr = total - pl
        gl = 1.0 - ((pl / nl[:, None]) ** 2).sum(axis=1)
        gr = 1.0 - ((pr / nr[:, None]) ** 2).sum(axis=1)
        score = (nl * gl + nr * gr) / n
        j = int(score.argmin())
        return float(score[j]), float((cs[cuts[j] - 1] + cs[cuts[j]]) / 2.0)

    def _build(self, X, y, depth, max_depth, min_leaf) -> int:
        node = self._add()
        counts = np.bincount(y, minlength=len(_LABELS))
        majority = int(counts.argmax())
        if depth >= max_depth or len(y) < 2 * min_leaf or counts.max() == len(y):
            self.label[node] = majority
            return node
        best = None
        for f in range(X.shape[1]):
            res = self._gini_split(X[:, f], y)
            if res and (best is None or res[0] < best[0]):
                best = (res[0], f, res[1])
        if best is None:
            self.label[node] = majority
            return node
        _, f, t = best
        mask = X[:, f] <= t
        if mask.sum() < min_leaf or (~mask).sum() < min_leaf:
            self.label[node] = majority
            return node
        self.feature[node] = f
        self.thresh[node] = t
        self.left[node] = self._build(X[mask], y[mask], depth + 1, max_depth, min_leaf)
        self.right[node] = self._build(X[~mask], y[~mask], depth + 1, max_depth, min_leaf)
        return node

    def predict_one(self, x: np.ndarray) -> int:
        i = 0
        while self.label[i] < 0:
            i = self.left[i] if x[self.feature[i]] <= self.thresh[i] else self.right[i]
        return self.label[i]


# ---------------------------------------------------------------------------
# deterministic training corpus (reference generator shapes, seed 42)
# ---------------------------------------------------------------------------


def training_blocks(n_per_kind: int = 60, block: int = 4096):
    """(blocks, labels) labeled by the exact analytic selector."""
    from .select import int_codec_sizes

    rng = np.random.default_rng(42)
    blocks: list[np.ndarray] = []
    for i in range(n_per_kind):
        x = np.arange(block, dtype=np.float64)
        slope = rng.uniform(0.5, 1000)
        noise = rng.integers(1, 1 << int(rng.uniform(1, 24)))
        blocks.append((slope * x + rng.integers(-noise, noise + 1, block)).astype(np.int64))
        # stepwise (generate_stepwise.py shape)
        steps = np.repeat(rng.integers(0, 1 << 20, block // 128), 128)
        blocks.append((steps + rng.integers(-3, 4, block)).astype(np.int64))
        # poisson gaps (sorted timestamps)
        gaps = rng.poisson(int(rng.uniform(10, 2e6)), block)
        blocks.append(np.cumsum(gaps).astype(np.int64))
        # low cardinality runs
        k = int(rng.uniform(2, 30))
        runs = rng.integers(1, 200, block // 16)
        vals = rng.integers(0, k, block // 16)
        blocks.append(np.repeat(vals, runs)[:block].astype(np.int64))
        # low cardinality shuffled (dict territory)
        blocks.append(rng.integers(0, int(rng.uniform(2, 4000)), block).astype(np.int64))
        # uniform random (raw territory)
        blocks.append(rng.integers(0, 1 << 62, block).astype(np.int64))
        # constant
        blocks.append(np.full(block, int(rng.integers(0, 1 << 40)), dtype=np.int64))
    labels = []
    for b in blocks:
        u = b.view(np.uint64)
        sizes = int_codec_sizes(u, np.uint64)
        labels.append(_LABEL_ID[min(sizes, key=sizes.get)])
    X = np.stack([block_features(b.view(np.uint64)) for b in blocks])
    return X, np.array(labels, dtype=np.int64), blocks


_default_tree: CartTree | None = None


def default_tree() -> CartTree:
    global _default_tree
    if _default_tree is None:
        X, y, _ = training_blocks()
        _default_tree = CartTree().fit(X, y)
    return _default_tree


def pick_int_codec_learned(vals: np.ndarray) -> str:
    return _LABELS[default_tree().predict_one(block_features(vals))]
