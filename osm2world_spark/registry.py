"""Strategy registry: the engine's named, config-dispatched extension
points (SURVEY §2.9).

Reference dispatch surfaces this generalizes:
- O2WConfig.terrainInterpolator (conversion/O2WConfig.java:510-518):
  a config string selects the TerrainInterpolator implementation by
  class simple name, unknown -> a default.
- O2WConfig.mapProjection (O2WConfig.java:465-470): same pattern for the
  map projection.
- module assembly (O2WConverterImpl createModuleList): configured module
  names resolved to implementations at run start.

The registry is the single lookup the config-facing entry points
(`operators.knn.interpolate`, `functions.projection.np_projection`,
`api.Engine`) resolve through, and the extension surface a user
registers custom strategies into (the analogue of putting a class on the
reference's classpath and naming it in config):

    >>> from osm2world_spark import registry
    >>> registry.register("interpolator", "mycubic", my_factory)
    >>> Engine(spark, EngineConfig(interpolator="mycubic"))

Names are case-insensitive and the reference's Java class names are
registered as aliases (config files written for the reference keep
working: ``terrainInterpolator=NaturalNeighborInterpolator``).
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, dict[str, Callable]] = {}


def register(category: str, name: str, factory: Callable, *aliases: str) -> None:
    """Register `factory` under `category`/`name` (plus aliases).
    Re-registering a name overrides it — user strategies shadow built-ins,
    like a classpath entry shadowing the bundled implementation."""
    cat = _REGISTRY.setdefault(category, {})
    for n in (name, *aliases):
        cat[n.lower()] = factory


def resolve(category: str, name: str) -> Callable:
    """Look up a strategy; unknown names raise listing what IS available
    (the reference silently falls back for the interpolator but raises
    for unknown output formats — we always raise: silent fallback in an
    analytics engine corrupts results)."""
    cat = _REGISTRY.get(category)
    if cat is None:
        raise ValueError(
            f"unknown strategy category {category!r}; have {sorted(_REGISTRY)}"
        )
    fn = cat.get(name.lower())
    if fn is None:
        raise ValueError(
            f"unknown {category} strategy {name!r}; available: {available(category)}"
        )
    return fn


def available(category: str) -> list[str]:
    """Sorted canonical+alias names registered under `category`."""
    return sorted(_REGISTRY.get(category, {}))


def categories() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    # interpolators (O2WConfig.java:511-518's switch arms, same names)
    from .operators.knn import idw_join, interpolate_29nn, lsq_interpolate

    def _natural(queries, sites, **kw):
        from .operators.natural import natural_neighbor_interpolate

        return natural_neighbor_interpolate(queries, sites, **kw)

    register(
        "interpolator", "leastsquares", lsq_interpolate, "leastsquaresinterpolator"
    )
    register(
        "interpolator",
        "inversedistanceweighting",
        idw_join,
        "idw",
        "inversedistanceweightinginterpolator",
    )
    register(
        "interpolator", "linear", interpolate_29nn, "linearinterpolator", "linear29"
    )
    register(
        "interpolator",
        "naturalneighbor",
        _natural,
        "naturalneighborinterpolator",
        "sibson",
    )

    # projections (O2WConfig.java:465-470)
    from .functions.projection import np_ortho_to_xz, np_to_xz

    register("projection", "metric", np_to_xz, "metricmapprojection", "mercator")
    register(
        "projection",
        "orthographic",
        np_ortho_to_xz,
        "orthographicazimuthalmapprojection",
        "ortho",
    )

    # dedup strategies (LLM-pipeline surface; SURVEY "training-data ops")
    from .operators.dedup import (
        exact_dup_groups,
        minhash_near_dups,
        ngram_jaccard_pairs,
        simhash64,
    )
    from .operators.similarity import embedding_near_dups

    register("dedup", "exact", exact_dup_groups)
    register("dedup", "minhash", minhash_near_dups, "minhashlsh")
    register("dedup", "simhash", simhash64)
    register("dedup", "ngram_jaccard", ngram_jaccard_pairs, "jaccard")
    register("dedup", "embedding", embedding_near_dups, "cosine")

    # ANN strategies
    from .operators.similarity import cosine_topk, ivf_topk, lsh_cosine_topk

    register("ann", "brute", cosine_topk, "exact")
    register("ann", "lsh", lsh_cosine_topk, "signlsh")
    register("ann", "ivf", ivf_topk)

    # elevation post-pass (EleConstraintEnforcer dispatch,
    # O2WConfig.java:373 NONE/SIMPLE; validator wraps any enforcer,
    # EleConstraintValidator.java:24)
    from .operators.elevation import enforce_simple, validated_enforce, zero_interpolate

    register("ele_enforcer", "simple", enforce_simple, "simpleeleconstraintenforcer")
    register("ele_enforcer", "none", lambda df, **kw: df, "noneeleconstraintenforcer")
    register("ele_enforcer", "validator", validated_enforce, "eleconstraintvalidator")
    register("interpolator", "zero", zero_interpolate, "zerointerpolator")


_register_builtins()
