from gaussian_splatterer_tpu.app.cli import main

raise SystemExit(main())
