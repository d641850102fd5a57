"""Composite operators built on DataFrames: temporal axes over
history views, as-of joins, ANN search, navigation helpers."""
