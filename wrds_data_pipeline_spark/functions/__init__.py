"""Scalar function layer — all JVM-side built-ins, zero Python UDFs
(the reference itself needs only one row lambda, replaceable by a
built-in; SURVEY.md §2.9)."""
