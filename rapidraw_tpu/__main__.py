from rapidraw_tpu.cli import main

raise SystemExit(main())
