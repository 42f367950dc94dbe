from . import ann, dedup, multimodal, sampling, scrub, sessions, textstats

__all__ = [
    "ann",
    "dedup",
    "multimodal",
    "sampling",
    "scrub",
    "sessions",
    "textstats",
]
