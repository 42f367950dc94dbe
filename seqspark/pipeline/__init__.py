from . import ann, dedup, multimodal, textstats

__all__ = ["ann", "dedup", "multimodal", "textstats"]
