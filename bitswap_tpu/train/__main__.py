from bitswap_tpu.train.cli import main

raise SystemExit(main())
