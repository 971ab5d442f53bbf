#!/bin/bash
# Run a python script against the real TPU with the right paths.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
exec python "$@"
