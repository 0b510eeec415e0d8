"""Shared jitted op wrappers for tests (compile once per static combo per
process; avoids JAX eager-dispatch overhead in the unrolled node loops)."""
import jax

from interpol_tpu.ops import pushpull as pp

jpull = jax.jit(pp.pull, static_argnums=(2, 3, 4))
jpush = jax.jit(pp.push, static_argnums=(2, 3, 4, 5))
jcount = jax.jit(pp.count, static_argnums=(1, 2, 3, 4))
jgrad = jax.jit(pp.grad, static_argnums=(2, 3, 4))
jhess = jax.jit(pp.hess, static_argnums=(2, 3, 4))
jpushgrad = jax.jit(pp.pushgrad, static_argnums=(2, 3, 4, 5))
