"""Deterministic stand-in programs for DSPyMator testing (picklable,
importable on executors — no LLM dependency)."""

from __future__ import annotations

import asyncio


def classify_length(**kwargs) -> dict:
    """Sync program: 'question' → short/long label + echoed reasoning."""
    q = str(kwargs.get("question", ""))
    return {
        "answer": "long" if len(q) > 20 else "short",
        "reasoning": f"len={len(q)}",
    }


async def async_classify_length(**kwargs) -> dict:
    await asyncio.sleep(0)  # prove the async path schedules
    return classify_length(**kwargs)
