"""Regression tests for the driver entry points (__graft_entry__)."""

import jax
import jax.numpy as jnp


def test_entry_returns_traceable_forward():
    import __graft_entry__

    fn, (params, images) = __graft_entry__.entry()
    # eval_shape traces without compiling (the driver compile-checks on
    # real hardware; here we assert the contract cheaply).
    out = jax.eval_shape(fn, params, images)
    assert out.shape == (4, 60, 90, 9)
    assert out.dtype == jnp.float32


def test_dryrun_multichip_8_devices():
    import __graft_entry__

    # conftest already forces CPU with 8 fake devices.
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_odd_device_count():
    import __graft_entry__

    # Odd counts fall back to a pure-DP 1-D mesh.
    __graft_entry__.dryrun_multichip(5)
