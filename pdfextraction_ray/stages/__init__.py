"""Ray Data stages: actor-pool parsers, routers, metric projections."""
