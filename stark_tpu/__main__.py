import sys

from stark_tpu.cli import main

sys.exit(main())
