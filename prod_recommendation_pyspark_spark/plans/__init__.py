from prod_recommendation_pyspark_spark.plans.pipeline import (  # noqa: F401
    PeerSearchConfig,
    ProdRecConfig,
    PostprocessConfig,
    run_peer_search,
    run_prod_rec,
    run_postprocess,
)
