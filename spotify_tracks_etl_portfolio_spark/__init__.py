"""spotify_tracks_etl_portfolio_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the capabilities of the
reference ELT pipeline ``miftahulmuhaemen/spotify-tracks-etl-portfolio``
(medallion bronze/silver ingest + validation + analytics; see SURVEY.md),
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design principles (SURVEY.md §7):
- DataFrame/SQL first — declare logical plans, let Catalyst/Tungsten pick
  the physical strategy.
- UDF-free parity surface; Pandas UDFs only where built-ins run out.
- Two-phase stats semantics preserved (stats over raw bronze → applied as
  literals in the silver transform), matching the reference's
  ``de_spotify_silver.py:49-70`` → ``de_spotify_silver.sql`` flow.
- Designed for 100 TB: partition-aware writes, broadcast-able dims,
  approx variants exposed as knobs, AQE on.
"""

from spotify_tracks_etl_portfolio_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
