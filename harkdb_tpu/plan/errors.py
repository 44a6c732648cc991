"""Planning-time error type, shared by the planner and its lowering
modules (``plan/strings.py``, ``plan/windows.py``)."""


class PlanError(Exception):
    """Semantic (resolution/validation) error. Subclasses Exception to stay
    compatible with the reference's bare ``raise Exception`` contract."""
