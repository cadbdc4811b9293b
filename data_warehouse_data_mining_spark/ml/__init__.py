"""Data-mining layer: profiling/prep, classification, metrics, balancing.

Re-expresses the reference's supervised pipeline (SURVEY.md §2.1 #19-30)
with the driver-side anti-patterns removed: batched profiling jobs,
distributed metrics, distributed SMOTE, leak-free cross-validation.
"""
