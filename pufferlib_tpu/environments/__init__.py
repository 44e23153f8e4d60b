"""Environment zoo. First-party jax-native envs live in
pufferlib_tpu.ocean; external CPU envs bind through the host bridge
(pufferlib_tpu.vector_host) in per-package modules here, mirroring the
reference pufferlib/environments/ layout (env_creator + Policy per
package, atari/__init__.py:1-12 pattern)."""
