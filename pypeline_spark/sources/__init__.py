"""Sources & sinks: format readers/writers and connector surface.

The reference reads from MySQL and writes to PostgreSQL through raw
connections (ref: /root/reference/pypeline/Pype.py:1-2,33-35); here the
I/O surface is Spark's DataSource API with per-format option mapping,
including the JDBC passthrough that carries the reference's
``bulk_size`` to fetchsize/batchsize.
"""

from pypeline_spark.sources.formats import (  # noqa: F401
    read_source,
    write_sink,
)
