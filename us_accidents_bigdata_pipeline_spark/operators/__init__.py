from . import clean, dedup, multimodal, profile, sample, similarity, textstats

__all__ = [
    "clean",
    "dedup",
    "multimodal",
    "profile",
    "sample",
    "similarity",
    "textstats",
]
