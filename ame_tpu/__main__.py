from ame_tpu.cli import main

raise SystemExit(main())
