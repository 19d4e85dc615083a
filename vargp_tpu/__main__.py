from vargp_tpu.experiments.cli import main

raise SystemExit(main())
