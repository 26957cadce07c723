"""ahoproc_tools stub: star-imported by se_dataset.py; only the (unused) F0
dataset path touches its symbols."""
