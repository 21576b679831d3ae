import sys

from hpccg_tpu.cli import main

sys.exit(main())
