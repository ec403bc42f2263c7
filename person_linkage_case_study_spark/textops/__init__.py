from .analysis import (
    add_language_guess,
    add_quality_signals,
    add_rolling_fingerprint,
    add_token_stats,
    tokens,
)

__all__ = [
    "add_language_guess",
    "add_quality_signals",
    "add_rolling_fingerprint",
    "add_token_stats",
    "tokens",
]
