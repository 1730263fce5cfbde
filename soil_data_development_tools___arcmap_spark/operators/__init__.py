from .tiebreak import RatingSpec, rating_order_expr, domain_rank_expr  # noqa: F401
from .component_agg import (  # noqa: F401
    agg_mapunit_passthrough,
    agg_dcp,
    agg_dcd,
    agg_wta,
    agg_maxmin,
    agg_limiting,
    agg_pp_sum,
)
from .horizon_agg import (  # noqa: F401
    clipped_thickness,
    agg_hz_wta_sum,
    agg_hz_wta_wta,
    agg_hz_dcp_wta,
    agg_hz_maxmin_then,
)
from .month_agg import month_collapse  # noqa: F401
