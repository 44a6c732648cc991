from harkdb_tpu.plan.expr import eval_expr
from harkdb_tpu.plan.planner import plan_query, QueryPlan, PlanError

__all__ = ["eval_expr", "plan_query", "QueryPlan", "PlanError"]
