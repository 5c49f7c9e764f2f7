"""Ray-facing stage callables: map_batches / map_groups bodies.

Stateless stages are plain functions (cheap elastic tasks); stateful stages
(broadcast index, model scorer) are callable classes used as actor pools.
All hot-path stages take/return ``pyarrow.Table`` (zero-copy batches).
"""
