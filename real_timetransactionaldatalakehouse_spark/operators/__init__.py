"""Operator library: every operator is a pure ``DataFrame -> DataFrame``
function (SURVEY.md section 7.1), testable on plain Parquet, with table
formats as a pluggable write layer."""
