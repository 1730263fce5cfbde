from .whereclause import parse_where  # noqa: F401
from .relwalk import join_path, build_join_chain  # noqa: F401
from .planner import RatingRequest, create_soil_map  # noqa: F401
