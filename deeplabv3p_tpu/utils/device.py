"""Shared --device CLI plumbing.

Every entry point that touches a JAX backend takes `--device {auto,cpu}`
so tools can run while the (single-client) TPU is busy, and so CI/tests
can force the CPU backend. Plain `JAX_PLATFORMS=cpu` env is NOT enough
on this rig — sitecustomize pins jax_platforms programmatically, so the
override must happen via jax.config before first backend use.
"""


def add_device_arg(parser):
    parser.add_argument(
        "--device", default="auto", choices=["auto", "cpu"],
        help="force the CPU backend (the TPU client is single-process)",
    )
    return parser


def apply_device_arg(args):
    """Call before any backend use (first jnp op / model init)."""
    if getattr(args, "device", "auto") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
