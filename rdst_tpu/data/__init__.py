"""Data layer: image ops, NIfTI/Analyze IO, dataset pipelines."""
