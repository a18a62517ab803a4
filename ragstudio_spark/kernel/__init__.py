"""Pure-Python text kernel: no Spark imports allowed in this subpackage.

Every function here is written to be called either on a single ``str`` or
mapped over a pandas Series inside an Arrow-batched pandas UDF.  The same
functions serve as the differential-test oracle for the Spark operators.
"""
