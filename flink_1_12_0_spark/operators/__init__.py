"""Engine operators — Spark-first implementations of the reference's
operator inventory (SURVEY.md §2) that aren't a bare DataFrame call.
"""
