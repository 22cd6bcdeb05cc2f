"""Layer A: the reference's pipeline surface on Spark.

YAML-configured pipelines of extract -> transform-chain -> keyed-sink
steps with placeholder hydration and a post-SQL hook, mirroring the
reference's ``pypelines``/``pypes`` config model
(ref: /root/reference/pypeline/Pypeline.py:38-48, Pype.py:14-21).
"""

from pypeline_spark.pipeline.hydrate import hydrate_query  # noqa: F401
from pypeline_spark.pipeline.spec import PipelineConfig, PypeSpec  # noqa: F401
from pypeline_spark.pipeline.runner import Pypeline  # noqa: F401
from pypeline_spark.pipeline.transformers import load_transformers  # noqa: F401
