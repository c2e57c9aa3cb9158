"""Sanity: tests run on the virtual 8-device CPU backend (conftest)."""

def test_backend_is_virtual_cpu_mesh():
    import jax

    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
