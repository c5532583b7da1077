from bitswap_tpu.codec.cli import main

raise SystemExit(main())
