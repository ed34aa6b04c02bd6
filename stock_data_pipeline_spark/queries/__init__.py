"""Query registry package: every implemented operator from SURVEY.md
section 2 (plus the LLM-pipeline extensions), one domain module per
query family, REGISTRY assembled here. Split from the former 31k-line
queries.py monolith (round-6 refactor); import surface is unchanged —
``from stock_data_pipeline_spark.queries import REGISTRY, queries, ...``
and every helper name keep resolving exactly as before.
"""

from __future__ import annotations

from . import _p1_parity_corpus as _p1_parity_corpus
from . import _p2_quality_indicators as _p2_quality_indicators
from . import _p3_rollups_features as _p3_rollups_features
from . import _p4_rankings_linkage as _p4_rankings_linkage
from . import _p5_sketches_multimodal as _p5_sketches_multimodal
from . import _p6_llm_eval as _p6_llm_eval
from . import _p7_stats_tests as _p7_stats_tests
from . import _p8_graph_timeseries as _p8_graph_timeseries
from . import _api as _api

# Re-export every top-level name of every part (underscore helpers
# included) so existing `from stock_data_pipeline_spark.queries import X`
# sites — tests import private helpers like _RBO_C — keep working.
for _m in (_p1_parity_corpus, _p2_quality_indicators, _p3_rollups_features, _p4_rankings_linkage, _p5_sketches_multimodal, _p6_llm_eval, _p7_stats_tests, _p8_graph_timeseries, _api):
    for _k in vars(_m).copy():
        if not _k.startswith('__'):
            globals()[_k] = vars(_m)[_k]
del _m, _k
