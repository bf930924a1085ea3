from .builder import PlanBuilder  # noqa: F401
from .spec import BehavioralFilter, DemographicFilters, QuerySpec  # noqa: F401
