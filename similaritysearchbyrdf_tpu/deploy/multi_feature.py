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

        q = per_family[0][0].shape[0]
        out_ids = np.full((q, k), -1, dtype=np.int32)
        out_scores = np.full((q, k), -np.inf, dtype=np.float32)
        for b in range(q):
            agg: Dict[int, float] = {}
            for ids, scores in per_family:
                for i, s in zip(ids[b], scores[b]):
                    if i >= 0 and np.isfinite(s):
                        agg[int(i)] = agg.get(int(i), 0.0) + float(s)
            top = sorted(agg.items(), key=lambda kv: -kv[1])[:k]
            for j, (i, s) in enumerate(top):
                out_ids[b, j] = i
                out_scores[b, j] = s
        return out_ids, out_scores

    multiFeatureSingleQuery = multi_feature_query

    def multi_feature_batch_query(self, queries, steps=0, k=10, query_ids=None):
        return self.multi_feature_query(queries, steps, k, query_ids)

    def clear_and_close(self) -> None:
        self.forests.clear()

    clearAndClose = clear_and_close
