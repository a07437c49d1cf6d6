"""Pure-Python core shared by the Spark UDF stages and the pytest oracle.

One implementation, no drift: every function here is a pure,
deterministic function of its inputs (discrete integer/rational
arithmetic; exact IEEE-754 doubles) so that extracted text is
byte-identical across partitionings and between the Spark pipeline and
the oracle.
"""
