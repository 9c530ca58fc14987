"""Pallas kernels: interpret-mode equivalence with the XLA fused assembly."""

import numpy as np
import jax.numpy as jnp

from meshfem_tpu.ops import element_matrices as em
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.kernels import element_stiffness_pallas


def test_element_stiffness_pallas_matches_xla():
    rng = np.random.default_rng(0)
    E = 300
    gl = jnp.asarray(rng.standard_normal((E, 4, 3)), jnp.float32)
    vol = jnp.asarray(np.abs(rng.standard_normal(E)) + 0.1, jnp.float32)
    D = et.isotropic(3, 200.0, 0.3)
    M = em.fused_matrix_for(D, 3, 2, jnp.float32)
    Kp = np.asarray(element_stiffness_pallas(gl, vol, M, interpret=True))
    Kx = np.asarray(em.element_elasticity_fused_apply(gl, vol, M, 10))
    np.testing.assert_allclose(Kp, Kx, rtol=1e-5,
                               atol=1e-5 * np.abs(Kx).max())
