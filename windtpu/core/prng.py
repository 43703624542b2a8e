"""PRNG stream management.

The reference relies on TF's global stateful RNG
(data_generator.py:299-301,322-324).  JAX keys are explicit; this tiny
helper gives named, reproducible streams without threading raw keys through
every call site.
"""

from __future__ import annotations

import dataclasses
import zlib

import jax


@dataclasses.dataclass
class KeyStream:
    """A splittable stream of PRNG keys.

    >>> ks = KeyStream(0)
    >>> k1 = ks.next()        # fresh key
    >>> sub = ks.fork("noise")  # independent named child stream
    """

    seed_or_key: dataclasses.InitVar = 0
    _key: jax.Array = dataclasses.field(init=False)

    def __post_init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, out = jax.random.split(self._key)
        return out

    def fork(self, name: str) -> "KeyStream":
        # Stable digest, NOT Python's hash(): str hashing is randomized
        # per process (PYTHONHASHSEED), which would give a different child
        # stream every run and desynchronize named streams across hosts.
        tag = zlib.crc32(name.encode("utf-8")) & 0x7FFFFFFF
        return KeyStream(jax.random.fold_in(self.next(), tag))
