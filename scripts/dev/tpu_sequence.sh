#!/bin/bash
# Sequential TPU validation: pallas kernel -> optimized update profile -> bench
cd /root/repo
echo "=== pallas check ===" 
timeout 1800 python scripts/dev/pallas_tpu_check.py
echo "=== profile4 pallas E=49152 ==="
timeout 1800 python scripts/dev/tpu_profile4.py 49152 pallas
echo "=== profile4 xla E=49152 ==="
timeout 1800 python scripts/dev/tpu_profile4.py 49152 xla
echo "=== bench ==="
timeout 2400 python bench.py
echo "=== done ==="
