from silk_spark.functions.measures import MEASURES, distance, similarity  # noqa: F401
from silk_spark.functions.transformers import TRANSFORMERS, transform  # noqa: F401
from silk_spark.functions.aggregators import AGGREGATORS, aggregate_scores  # noqa: F401
