from .calculus import Scenario, estimate_scenario, validate_scenario  # noqa: F401
from .engine import estimate_df, normalize, scenario_schema, validate  # noqa: F401
from .stream import estimate_stream, scenarios_stream  # noqa: F401
