from f1_datalakehouse_pipeline_spark.cli import main

raise SystemExit(main())
