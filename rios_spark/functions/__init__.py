"""Scalar/column function facade (SURVEY.md §2.8)."""

from rios_spark.grid import (  # noqa: F401
    cell_col,
    cell_coord_cols,
    cell_sql,
    cell_x_col,
    cell_y_col,
    geocode_cols,
    geocode_sql,
    inverse_mercator_cols,
    kring_cells_col,
    mercator_cols,
    parent_col,
)
from rios_spark.spatial import _haversine_col as haversine_col  # noqa: F401
from rios_spark.ann import cosine_sim_col  # noqa: F401
from rios_spark.textops import (  # noqa: F401
    bpe_token_count_col,
    extract_text_udf,
    fingerprint_col,
    fingerprint_sql_duckdb,
    make_lang_id_udf,
    quality_score_col,
    token_count_col,
)
