from flink_kakfa_spark.cli import main

raise SystemExit(main())
