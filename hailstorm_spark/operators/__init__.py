"""Reusable DataFrame→DataFrame operators (the engine's library API).

Each operator here is a plain function over DataFrames/Columns so it
can be composed into arbitrary pipelines; the ``queries`` package wraps
them into the driver-checkable query registry.
"""
