"""Planning-time error type, shared by the planner and its lowering
modules (``plan/strings.py``, ``plan/windows.py``)."""


class PlanError(Exception):
    """Semantic (resolution/validation) error. Subclasses Exception to stay
    compatible with the reference's bare ``raise Exception`` contract.

    ``unresolved_kind``/``unresolved_name`` optionally carry STRUCTURED
    name-resolution data ("table"/"column" + the identifier that failed to
    resolve) so callers — the correlated-subquery classifier in
    ``planner._collect_subqueries`` — can inspect the failure without
    regex-matching the message text (round-4 advisor finding: an inner
    table whose name collides with an outer alias was misclassified)."""

    def __init__(self, message: str, unresolved_kind: str | None = None,
                 unresolved_name: str | None = None):
        super().__init__(message)
        self.unresolved_kind = unresolved_kind
        self.unresolved_name = unresolved_name
