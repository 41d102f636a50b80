from gisnav_tpu.cli import main

raise SystemExit(main())
