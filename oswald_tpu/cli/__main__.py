import sys

from oswald_tpu.cli.main import main

sys.exit(main())
