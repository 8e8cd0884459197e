"""Operator plan builders."""
from .asof import asof_join
from .rangejoin import range_join
from .skew import salted_agg, salted_join
from .stats import KolmogorovSmirnovTest, ks_test, tTest, ttest
from .upsert import latest_by_key, upsert

__all__ = ["asof_join", "range_join", "salted_agg", "salted_join", "ttest", "tTest",
           "ks_test", "KolmogorovSmirnovTest", "latest_by_key", "upsert"]
