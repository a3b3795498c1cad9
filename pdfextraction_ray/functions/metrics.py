"""Cost/usage arithmetic and rule-based optimization hints (SURVEY §2.5 G2-G4,
§2.8 F8 — reference services/cost_tracker.py and
services/openai_service.py:222-254).

The engine has no LLM calls, but keeps the capability surface: a per-task
price table, cost computation as a vectorized column, and the grouped
usage-summary / analysis shapes as plain Dataset aggregations (the G2/G3
groupbys live in queries.py as ``events_by_type`` / ``events_window``).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

# Reference price table, $/1K tokens (input, output)
# (services/openai_service.py:226-231).
MODEL_PRICES: dict[str, tuple[float, float]] = {
    "gpt-3.5-turbo": (0.0015, 0.002),
    "gpt-4o-mini": (0.00015, 0.0006),
    "gpt-4o": (0.0025, 0.01),
    "gpt-4": (0.03, 0.06),
}
DEFAULT_PRICE = (0.0015, 0.002)


def estimated_cost(model: str, input_tokens: int, output_tokens: int) -> float:
    pin, pout = MODEL_PRICES.get(model, DEFAULT_PRICE)
    return (input_tokens / 1000.0) * pin + (output_tokens / 1000.0) * pout


def add_cost_column(batch: pa.Table, *, model_col: str = "model",
                    in_col: str = "input_tokens", out_col: str = "output_tokens",
                    out_name: str = "estimated_cost") -> pa.Table:
    """Vectorized F8: cost column from token counts and the price table."""
    models = batch.column(model_col).to_pylist()
    pin = pa.array([MODEL_PRICES.get(m, DEFAULT_PRICE)[0] for m in models],
                   pa.float64())
    pout = pa.array([MODEL_PRICES.get(m, DEFAULT_PRICE)[1] for m in models],
                    pa.float64())
    cost = pc.add(
        pc.multiply(pc.divide(pc.cast(batch.column(in_col), pa.float64()), 1000.0), pin),
        pc.multiply(pc.divide(pc.cast(batch.column(out_col), pa.float64()), 1000.0), pout))
    return batch.append_column(out_name, cost)


def optimization_suggestions(task_stats: dict[str, dict[str, Any]]) -> list[str]:
    """G4 rule scan over grouped averages. ``task_stats`` maps task ->
    {"cost": float, "count": int, "models": set/list}."""
    suggestions: list[str] = []
    for task, data in task_stats.items():
        count = max(1, int(data.get("count", 0)))
        avg = float(data.get("cost", 0.0)) / count
        models = set(data.get("models", []))
        if task == "classification" and "gpt-4" in models:
            suggestions.append(
                f"Classification: consider gpt-3.5-turbo instead of gpt-4 "
                f"(avg cost: ${avg:.4f})")
        if task == "field_identification" and avg > 0.01:
            suggestions.append(
                f"Field identification: high average cost ${avg:.4f} - "
                f"consider gpt-4o-mini")
        if task == "data_extraction" and "gpt-3.5-turbo" in models:
            suggestions.append(
                f"Data extraction: cheaper model may reduce accuracy. "
                f"Current avg: ${avg:.4f}")
    if not suggestions:
        suggestions.append("Current model selection appears optimized for the workload")
    return suggestions
