"""Pure functional geometry, scoring, and state machines.

Everything here is host-side numpy/python (deterministic, accelerator-free)
unless a ``_jnp``-suffixed batched variant is provided for the device path.
"""
