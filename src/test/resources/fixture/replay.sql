/*dodo{"ts":"2024-08-06 23:44:11.041","client":"192.168.48.119:51970","user":"root","db":"__internal_schema","queryId":"8cb2e4f433e74463-a0ededde7b648b35","durationMs":10}*/ select "hello world 1" as hello;
/*dodo{"ts":"2024-08-06 23:44:11.043","client":"192.168.48.118:51970","user":"root","db":"__internal_schema","queryId":"8eaf2c126a249c7-8d48a95bd8501cc9","durationMs":10}*/ select 1.0 as num;
/*dodo{"ts":"2024-08-06 23:44:12.044","client":"192.168.48.119:51970","user":"root","db":"__internal_schema","queryId":"60b885f02d014194-b225555e4ed26d7e","durationMs":10}*/ select 'hello world 2' as hello;
/*dodo{"ts":"2024-08-06 23:44:11.045","client":"192.168.48.118:51970","user":"root","db":"__internal_schema","queryId":"ffb1d743a9eb4394-9b48a38bcc0b8b19","durationMs":10}*/ select 2.0 as num;
/*dodo{"ts":"2024-08-06 23:44:13.046","client":"192.168.48.119:51970","user":"root","db":"__internal_schema","queryId":"41dc7120df0040c0-a677b93ad1a28d27","durationMs":10}*/ select "hello world 3" as hello;
/*dodo{"ts":"2024-08-06 23:44:12.047","client":"192.168.48.118:51970","user":"root","db":"__internal_schema","queryId":"18799575029447f9-a6a3fc65c8eda3f1","durationMs":10}*/ SHOW VARIABLES LIKE 
'%time_zone%';
/*dodo{"ts":"2024-08-06 23:44:13.048","client":"192.168.48.118:51970","user":"root","db":"__internal_schema","queryId":"18799575029447f9-a6a3fc65c8eda3f2","durationMs":10}*/ SHOW VARIABLES LIKE '%time_zone%';
