"""Pure, stateless functions (the reference's scalar/predicate layer).

Everything in this package is side-effect-free and usable both from
vectorized ``map_batches`` stages and from unit tests that mirror the
reference's parametrized matrices.
"""
