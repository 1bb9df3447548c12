#!/bin/bash
# Poll until the axon relay initializes (outages are intermittent), then run.
until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  sleep 90
done
exec "$@"
