from centimators_spark.cli import main

raise SystemExit(main())
