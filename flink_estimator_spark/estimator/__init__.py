from .calculus import Scenario, estimate_scenario  # noqa: F401
