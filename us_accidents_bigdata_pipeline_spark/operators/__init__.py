from . import clean, dedup, profile, sample, similarity, textstats

__all__ = ["clean", "dedup", "profile", "sample", "similarity", "textstats"]
