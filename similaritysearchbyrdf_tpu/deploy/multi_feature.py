"""Multi-feature front-end — the `HashTableInit` capability.

The reference's (deprecated) multi-feature deploy layer
(`deploy/HashTableInit.scala:173-462`) keeps three parallel table families
("blue/green/red", e.g. HSV channels of video features) and unions candidate
sets across families at query time (`multiFeatureSingleQuery`,
`HashTableInit.scala:321-345`). Here each feature family is simply an
independent forest; the multi-feature query is a score-level merge of
per-family top-k — with the reference's candidate-union semantics available
through a large k.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import RDFConfig
from ..index.forest import RDFForest
from ..vectors import DenseBatch


class MultiFeatureRDFInit:
    """N named feature families, each with its own forest over its own
    feature space (the reference hardcodes three: blue/green/red)."""

    def __init__(self, feature_names: Sequence[str] = ("blue", "green", "red")):
        self.feature_names = list(feature_names)
        self.forests: Dict[str, RDFForest] = {}
        self.confs: Dict[str, RDFConfig] = {}

    # -- init (`initializeMapDBHashMultiple`, HashTableInit.scala:173-254) --
    def initialize_multiple(self, confs: Dict[str, RDFConfig]) -> None:
        for name in self.feature_names:
            conf = confs[name]
            self.confs[name] = conf
            self.forests[name] = RDFForest(conf)

    initializeMapDBHashMultiple = initialize_multiple

    # -- fit (`newMultiFastFit`, HashTableInit.scala:414-462) ---------------
    def new_multi_fast_fit(self, batches: Dict[str, DenseBatch]) -> None:
        """Fit every feature family; ids must agree across families (the
        reference inserts the same key into all three table sets)."""
        for name in self.feature_names:
            self.forests[name].fit(batches[name])

    newMultiFastFit = new_multi_fast_fit

    # -- query (`multiFeatureSingleQuery`, HashTableInit.scala:321-345) -----
    def multi_feature_query(
        self,
        queries: Dict[str, np.ndarray],
        steps: int = 0,
        k: int = 10,
        query_ids: Optional[np.ndarray] = None,
        weights: Optional[Dict[str, float]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Query every family and merge: the union of per-family candidates
        ranked by the weighted sum of per-family scores (the reference
        unions raw candidate sets; weighting generalizes that)."""
        weights = weights or {n: 1.0 for n in self.feature_names}
        per_family: List[Tuple[np.ndarray, np.ndarray]] = []
        for name in self.feature_names:
            ids, scores = self.forests[name].query(
                queries[name], steps=steps, query_ids=query_ids, k=max(k * 4, 32)
            )
            per_family.append((ids, scores * weights.get(name, 1.0)))

        # vectorized merge (no per-query Python dict loop): per row, sort the
        # concatenated (id, score) pairs by id, segment-sum scores of equal
        # ids via cumsum differences at run boundaries, then top-k
        ids = np.concatenate([i for i, _ in per_family], axis=1)      # [Q, M]
        scores = np.concatenate([s for _, s in per_family], axis=1)
        q, m = ids.shape
        valid = (ids >= 0) & np.isfinite(scores)
        big = np.iinfo(np.int32).max
        key = np.where(valid, ids, big)
        sc = np.where(valid, scores, 0.0).astype(np.float64)
        order = np.argsort(key, axis=1, kind="stable")
        ids_s = np.take_along_axis(key, order, axis=1)
        sc_s = np.take_along_axis(sc, order, axis=1)
        csum = np.cumsum(sc_s, axis=1)
        is_first = np.concatenate(
            [np.ones((q, 1), bool), ids_s[:, 1:] != ids_s[:, :-1]], axis=1
        )
        is_last = np.concatenate(
            [ids_s[:, 1:] != ids_s[:, :-1], np.ones((q, 1), bool)], axis=1
        )
        col = np.broadcast_to(np.arange(m), (q, m))
        first_idx = np.maximum.accumulate(np.where(is_first, col, 0), axis=1)
        base = np.take_along_axis(csum - sc_s, first_idx, axis=1)
        gsum = np.where(is_last & (ids_s != big), csum - base, -np.inf)
        kk = min(k, m)
        top = np.argpartition(-gsum, kth=kk - 1, axis=1)[:, :kk]
        top_scores = np.take_along_axis(gsum, top, axis=1)
        ord2 = np.argsort(-top_scores, axis=1, kind="stable")
        top = np.take_along_axis(top, ord2, axis=1)
        top_scores = np.take_along_axis(top_scores, ord2, axis=1)
        top_ids = np.take_along_axis(ids_s, top, axis=1)
        out_ids = np.full((q, k), -1, dtype=np.int32)
        out_scores = np.full((q, k), -np.inf, dtype=np.float32)
        keep = np.isfinite(top_scores)
        out_ids[:, :kk] = np.where(keep, top_ids, -1)
        out_scores[:, :kk] = np.where(keep, top_scores, -np.inf)
        return out_ids, out_scores

    multiFeatureSingleQuery = multi_feature_query

    def multi_feature_batch_query(self, queries, steps=0, k=10, query_ids=None):
        return self.multi_feature_query(queries, steps, k, query_ids)

    def clear_and_close(self) -> None:
        self.forests.clear()

    clearAndClose = clear_and_close
