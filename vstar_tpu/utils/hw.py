"""Hardware/backend detection helpers.

The axon TPU relay presents its device as platform "tpu" (the PJRT
client proxies a real chip — scripts/tpu_smoke.py asserts exactly that),
so code must NOT gate relay-specific behavior on
`jax.devices()[0].platform == "axon"`: that string never appears on the
device even though the xla_bridge backend registry calls the plugin
"axon". The robust markers are (a) the PALLAS_AXON_POOL_IPS env var that
the relay's sitecustomize keys on, and (b) "axon" in the client's
platform_version, checked as fallbacks of each other.
"""

from __future__ import annotations

import os


def is_axon_relay() -> bool:
    """True when running through the axon TPU relay (serialized FIFO
    transfers, no host callbacks, ~5-15 ms dispatch+fetch round trips).
    Feature gates that depend on transfer/compute overlap
    (e.g. BatchedVSMEngine.prefetch_canvas) disable themselves here."""
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    import jax
    devs = jax.devices()
    if not devs:
        return False
    if devs[0].platform == "axon":   # belt-and-braces: name may change
        return True
    pv = str(getattr(getattr(devs[0], "client", None),
                     "platform_version", "") or "")
    return "axon" in pv.lower()
