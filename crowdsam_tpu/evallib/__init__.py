"""Evaluation: CrowdHuman AP / MR^-2 / Recall (Caltech matching) + format
converters."""
