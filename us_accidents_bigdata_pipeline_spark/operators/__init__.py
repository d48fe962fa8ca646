from . import clean, dedup, multimodal, profile, sample, similarity, textstats, viz

__all__ = [
    "clean",
    "dedup",
    "multimodal",
    "profile",
    "sample",
    "similarity",
    "textstats",
    "viz",
]
